"""Gate-level tests for driver queries: the SRP-LSH embedding near-dup
(parity with brute force + no-cartesian plan) and the multimodal feature
gate (canonicalizable scalar schema, like the driver's hash step)."""

import numpy as np
import pandas as pd

from lidartree_spark.queries import queries

SF = "/root/testdata/sf0.01"


def _brute_force_pairs():
    """Independent numpy replica of the near-dup corpus + exact threshold."""
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    pdf = pdf[pdf.vec_id < 300].sort_values("vec_id")
    ids = pdf.vec_id.to_numpy()
    v = np.round(np.stack(pdf.embedding.to_numpy()).astype(np.float64)
                 * 10000.0).astype(np.int64)
    # perturbed copy: v'[i] = v[i] + floor(v[(i mod 64)+1] / 10) (1-based)
    pert = v + np.floor(v[:, (np.arange(64) + 1) % 64] / 10.0).astype(np.int64)
    corpus = np.vstack([v, pert]).astype(np.float64)
    cids = np.concatenate([ids, ids + 100000])
    norm = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    sims = norm @ norm.T
    n = len(cids)
    out = set()
    for i in range(n):
        for j in range(n):
            if cids[i] < cids[j] and sims[i, j] >= 0.95:
                out.add((int(cids[i]), int(cids[j])))
    return out


def test_embedding_neardup_lsh_matches_brute_force(spark):
    """The SRP-LSH + rerank gate returns EXACTLY the brute-force >=0.95
    pair set on this corpus (complete recall of the planted pairs)."""
    got = queries()["embedding_neardup"](spark, SF).collect()
    got_pairs = {(r.doc_a, r.doc_b) for r in got}
    assert got_pairs == _brute_force_pairs()
    # planted pairs: one per original (cosine ~0.995)
    assert len(got_pairs) == 300


def test_embedding_neardup_plan_has_no_cartesian(spark):
    df = queries()["embedding_neardup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_gate_is_canonicalizable(spark):
    """The driver canonicalizes by sort_values over ALL columns — every
    column must be hashable scalars (the round-1 failure was a raw
    array<float> column)."""
    df = queries()["multimodal_image_features"](spark, SF)
    pdf = df.toPandas()
    assert len(pdf) == 16
    # this raised TypeError: unhashable type 'list' before the fix
    canon = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    assert canon.thumb_len.eq(256).all()
    assert canon.thumb_norm.gt(0).all()
    assert canon["std"].gt(0).all()
