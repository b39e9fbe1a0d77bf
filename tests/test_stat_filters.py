"""Invariants for the statistical text-selection family (stat_filters:
CCNet-style bigram-LM perplexity buckets, DSIR importance selection,
tf-idf keywords). Spark<->DuckDB parity is covered by
tests/test_extended_oracles.py; these pin the SEMANTICS."""

import pytest

from lidartree_spark.queries import queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    df = queries()["stat_filters"](spark, SF)
    out = {}
    for r in df.collect():
        out.setdefault(r["section"], []).append(r)
    return out


def test_ppl_buckets_partition_by_rank(rows):
    ppl = rows["ppl"]
    by_bucket = {}
    for r in ppl:
        by_bucket.setdefault(r["tag"], []).append(r["x"])
    # rank cut: head <= 33%, head+middle <= 67%, everything bucketed
    n = len(ppl)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert len(by_bucket["head"]) == n * 33 // 100
    assert len(by_bucket["head"]) + len(by_bucket["middle"]) == n * 67 // 100
    # buckets are ordered by score: every head xent <= every middle <= tail
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_ppl_score_is_mean_bigram_logprob(rows):
    for r in rows["ppl"][:50]:
        # x (xent) == -sum_qlp / n_bigrams / 1e4 exactly (two IEEE divides;
        # 1e4 is the quantize-then-sum grid for the engine-computed LN terms)
        assert r["x"] == (0 - r["k2"]) / float(r["k1"]) / 1e4


def test_dsir_selects_top_weights(rows):
    dsir = sorted(rows["dsir"], key=lambda r: r["x"])
    assert len(dsir) == 25
    # ranks are 1..25 and weights descend with rank (ties impossible after
    # the deterministic doc_id tie-break, but weights must be non-increasing)
    assert [int(r["x"]) for r in dsir] == list(range(1, 26))
    wts = [r["k2"] for r in dsir]
    assert wts == sorted(wts, reverse=True)


def test_tfidf_top3_descending(rows):
    per_doc = {}
    for r in rows["tfidf"]:
        per_doc.setdefault(r["id"], []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r["k1"])  # k1 = rank
        assert [r["k1"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        scores = [r["k2"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        # terms are the doc's own tokens (tf >= 1)
        assert all(r["x"] >= 1 for r in rs)


def test_reference_slice_scores_better(spark):
    """Documents in the LM's own training slice (lang='en') must dominate
    the head bucket: the model was fit on them, so their mean cross-entropy
    is systematically lower than the non-en mix."""
    df = queries()["lm_perplexity"](spark, SF)
    langs = {r["doc_id"]: r["bucket"] for r in df.collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "lang").collect()
    en = [d["doc_id"] for d in docs if d["lang"] == "en"]
    head = [d for d, b in langs.items() if b == "head"]
    frac_en_in_head = len(set(en) & set(head)) / len(head)
    frac_en_overall = len(en) / len(docs)
    assert frac_en_in_head > frac_en_overall
