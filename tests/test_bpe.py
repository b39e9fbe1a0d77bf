"""BPE trainer: distributed == pure-python local replica on the real
documents corpus (including tie-breaks), segmentation properties, and
apply/round-trip invariants."""

from collections import Counter

import pandas as pd

from lidartree_spark.operators.tokenize import (apply_bpe, segment_word,
                                                train_bpe_merges)

SF = "/root/testdata/sf0.001"


def _local_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference: dict/Counter loop, same tie-break."""
    merges = []
    for _ in range(n_merges):
        ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
        pairs: Counter = Counter()
        for w, c in word_counts.items():
            syms = segment_word(w, ranks)
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), n = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, n))
    return merges


def test_distributed_matches_local_replica_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = train_bpe_merges(docs, 12)
    wc: Counter = Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                wc[w] += 1
    want = _local_bpe(dict(wc), 12)
    assert got == want
    # merge counts are non-increasing is NOT guaranteed by BPE in general,
    # but every count must be positive and pairs unique
    assert all(n > 0 for _, _, n in got)
    assert len({(a, b) for a, b, _ in got}) == len(got)


def test_segment_word_merge_semantics():
    # rank order decides: with (a,b) ranked before (b,c), 'abc' -> ab, c
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    assert segment_word("abc", ranks) == ["ab", "c"]
    # left-to-right non-overlapping within one merge pass: 'aaa' with
    # (a,a) -> ['aa', 'a'], then no (aa,a) rank -> stays
    assert segment_word("aaa", {("a", "a"): 0}) == ["aa", "a"]
    # chained merges re-apply until fixpoint
    r2 = {("a", "a"): 0, ("aa", "aa"): 1}
    assert segment_word("aaaa", r2) == ["aaaa"]
    assert segment_word("x", {}) == ["x"]


def test_apply_bpe_reconstructs_text(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    merges = train_bpe_merges(docs, 8)
    toks = {r.doc_id: list(r.tokens)
            for r in apply_bpe(docs, merges).collect()}
    for r in docs.collect():
        # concatenating a word's subword tokens recovers the word, so the
        # token stream joined per word recovers the whitespace-split text
        words = [w for w in r.text.split(" ") if w]
        stream = toks[r.doc_id]
        rebuilt, i = [], 0
        for w in words:
            acc = ""
            while acc != w:
                acc += stream[i]
                i += 1
            rebuilt.append(acc)
        assert i == len(stream)
        assert rebuilt == words


def test_trainer_is_deterministic_across_runs(spark):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["ba ab ba", "ab ba ab", "ca ac"] * 5)]
    docs = spark.createDataFrame(pd.DataFrame(rows),
                                 schema="doc_id long, text string")
    m1 = train_bpe_merges(docs, 5)
    m2 = train_bpe_merges(docs.repartition(7), 5)
    assert m1 == m2
