"""Product quantization: codebook training (init + distributed Lloyd vs a
local replica), encoding, residual mode, ADC recall, and refine==exact."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(ROUND(x * 10000, 0) AS BIGINT))"
        " AS embedding").cache()


def _local(emb):
    rows = emb.collect()
    return {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in rows}


def test_codebook_init_is_md5_rows(spark, emb):
    from pyspark.sql import functions as F

    from lidartree_spark.operators.similarity import train_pq_codebook
    book = train_pq_codebook(emb, m=4, ksub=8, iters=0, seed=151)
    assert book.shape == (4, 8, 16)
    want_ids = [r.vec_id for r in
                emb.withColumn("_h", F.md5(F.concat_ws(
                    "|", F.lit(151), F.col("vec_id").cast("string"))))
                .orderBy("_h").limit(8).collect()]
    local = _local(emb)
    for j, vid in enumerate(want_ids):
        np.testing.assert_array_equal(
            book[:, j, :].ravel(), local[vid])


def test_codebook_lloyd_matches_local_replica(spark, emb):
    """One distributed Lloyd iteration == a driver-side per-subspace
    k-means step on the collected vectors (empty cells keep centroids)."""
    from lidartree_spark.operators.similarity import train_pq_codebook
    b0 = train_pq_codebook(emb, m=4, ksub=8, iters=0, seed=151)
    b1 = train_pq_codebook(emb, m=4, ksub=8, iters=1, seed=151)
    vecs = np.stack(list(_local(emb).values()))
    sub = vecs.reshape(len(vecs), 4, 16)
    want = b0.copy()
    for s in range(4):
        d2 = ((sub[:, s, None, :] - b0[s][None, :, :]) ** 2).sum(2)
        a = d2.argmin(1)
        for j in range(8):
            if (a == j).any():
                want[s, j] = sub[a == j, s, :].mean(0)
    np.testing.assert_allclose(b1, want, rtol=0, atol=1e-9)


def test_pq_encode_matches_local_argmin(spark, emb):
    from lidartree_spark.operators.similarity import (pq_encode,
                                                      train_pq_codebook)
    book = train_pq_codebook(emb, m=4, ksub=8, iters=1, seed=151)
    got = {r.vec_id: list(r.code)
           for r in pq_encode(emb, book).collect()}
    local = _local(emb)
    for vid, v in list(local.items())[:50]:
        sub = v.reshape(4, 16)
        want = [int(((sub[s][None, :] - book[s]) ** 2).sum(1).argmin())
                for s in range(4)]
        assert got[vid] == want, vid


def test_pq_encode_residual_mode(spark, emb):
    from lidartree_spark.operators.similarity import (pq_encode,
                                                      train_centroids,
                                                      train_pq_codebook)
    book = train_pq_codebook(emb, m=4, ksub=8, iters=0, seed=151)
    cen = train_centroids(emb, n_centroids=4, iters=0, seed=131)
    got = {r.vec_id: list(r.code)
           for r in pq_encode(emb, book, coarse=cen).collect()}
    local = _local(emb)
    for vid, v in list(local.items())[:25]:
        d2c = ((v[None, :] - cen) ** 2).sum(1)
        res = v - cen[d2c.argmin()]
        sub = res.reshape(4, 16)
        want = [int(((sub[s][None, :] - book[s]) ** 2).sum(1).argmin())
                for s in range(4)]
        assert got[vid] == want, vid


def test_pq_refine_equals_exact_l2(spark, emb):
    """A refine shortlist covering every candidate must return the exact
    full-vector L2 top-k (ADC only orders the shortlist)."""
    from lidartree_spark.operators.similarity import (pq_topk,
                                                      train_centroids,
                                                      train_pq_codebook)
    book = train_pq_codebook(emb, m=4, ksub=8, iters=1, seed=151)
    cen = train_centroids(emb, n_centroids=16, iters=0, seed=131)
    got = pq_topk(emb, emb.where("vec_id < 4"), k=3, codebook=book,
                  coarse_centroids=cen, nprobe=16, refine=1000).collect()
    local = _local(emb)
    for q in range(4):
        qv = local[q]
        d2 = {i: ((v - qv) ** 2).sum() for i, v in local.items() if i != q}
        want = sorted(d2, key=lambda i: (d2[i], i))[:3]
        mine = [r.vec_id for r in sorted((r for r in got if r.qid == q),
                                         key=lambda r: r.rk)]
        assert mine == want, q


def _recall_at_10(got, local, n_queries):
    hits = tot = 0
    for q in range(n_queries):
        qv = local[q]
        d2 = {i: ((v - qv) ** 2).sum() for i, v in local.items() if i != q}
        want = set(sorted(d2, key=lambda i: (d2[i], i))[:10])
        mine = {r.vec_id for r in got if r.qid == q}
        hits += len(want & mine)
        tot += 10
    return hits / tot


def test_pq_adc_recall_floor_isotropic(spark, emb):
    """Pure ADC (no refine) on the near-isotropic sf corpus — the WORST
    case for PQ (no cluster structure to exploit). Chance recall@10 over
    499 candidates is ~0.02; ADC must still do several times better."""
    from lidartree_spark.operators.similarity import (pq_topk,
                                                      train_centroids,
                                                      train_pq_codebook)
    book = train_pq_codebook(emb, m=4, ksub=8, iters=2, seed=151)
    cen = train_centroids(emb, n_centroids=16, iters=0, seed=131)
    got = pq_topk(emb, emb.where("vec_id < 8"), k=10, codebook=book,
                  coarse_centroids=cen, nprobe=16).collect()
    assert _recall_at_10(got, _local(emb), 8) >= 0.08


def test_pq_adc_recall_clustered(spark):
    """On clustered data (the realistic embedding shape) ADC recall@10
    must be high: neighbors share cluster AND codewords."""
    import pandas as pd

    from lidartree_spark.operators.similarity import (pq_topk,
                                                      train_centroids,
                                                      train_pq_codebook)
    rng = np.random.default_rng(41)
    centers = rng.normal(scale=10.0, size=(8, 64))
    vecs = np.round(centers[np.arange(400) % 8]
                    + rng.normal(scale=1.0, size=(400, 64)), 3)
    df = spark.createDataFrame(pd.DataFrame(
        {"vec_id": np.arange(400), "embedding": [v.tolist() for v in vecs]}))
    book = train_pq_codebook(df, m=4, ksub=8, iters=3, seed=151)
    cen = train_centroids(df, n_centroids=8, iters=2, seed=131)
    # pure ADC: within a tight cluster many points share a code, so ADC
    # cannot ORDER them — but every neighbor it returns must come from the
    # query's true cluster (the property ADC does guarantee here)
    adc_only = pq_topk(df, df.where("vec_id < 8"), k=10, codebook=book,
                       coarse_centroids=cen, nprobe=8).collect()
    for r in adc_only:
        assert r.vec_id % 8 == r.qid % 8, (r.qid, r.vec_id)
    # ADC shortlist (400 -> 80) + exact rerank: the standard two-stage
    # recall recovery must get recall@10 near 1
    got = pq_topk(df, df.where("vec_id < 8"), k=10, codebook=book,
                  coarse_centroids=cen, nprobe=8, refine=8).collect()
    local = {i: vecs[i].astype(np.float64) for i in range(400)}
    assert _recall_at_10(got, local, 8) >= 0.9


def test_pq_residual_with_zero_coarse_equals_plain(spark, emb):
    """coarse = the single zero centroid makes every residual the vector
    itself, so by_residual must reproduce the plain-ADC ranking exactly."""
    import numpy as np

    from lidartree_spark.operators.similarity import (pq_topk,
                                                      train_pq_codebook)
    book = train_pq_codebook(emb, m=4, ksub=8, iters=1, seed=151)
    zero = np.zeros((1, 64))
    plain = pq_topk(emb, emb.where("vec_id < 4"), k=5, codebook=book,
                    coarse_centroids=zero, nprobe=1).collect()
    resid = pq_topk(emb, emb.where("vec_id < 4"), k=5, codebook=book,
                    coarse_centroids=zero, nprobe=1,
                    by_residual=True).collect()
    key = lambda r: (r.qid, r.rk, r.vec_id, r.adc)  # noqa: E731
    assert sorted(map(key, plain)) == sorted(map(key, resid))


def test_pq_residual_beats_global_on_clustered(spark):
    """Classic IVF-PQ: when within-cluster variation has STRUCTURE (here
    each vector = cluster center + one of 8 shared offsets + tiny noise —
    pure isotropic residual noise is unquantizable by anything), the
    residual-trained codebook captures it while a global 8-codeword-per-
    subspace codebook must span centers x offsets and collapses — so
    residual ADC recall@10 must beat global ADC recall."""
    import pandas as pd

    from lidartree_spark.operators.similarity import (pq_topk,
                                                      train_centroids,
                                                      train_pq_codebook)
    rng = np.random.default_rng(41)
    centers = rng.normal(scale=10.0, size=(8, 64))
    offsets = rng.normal(scale=3.0, size=(8, 64))
    idx = np.arange(400)
    vecs = np.round(centers[idx % 8] + offsets[(idx // 8) % 8]
                    + rng.normal(scale=0.05, size=(400, 64)), 3)
    df = spark.createDataFrame(pd.DataFrame(
        {"vec_id": idx, "embedding": [v.tolist() for v in vecs]}))
    cen = train_centroids(df, n_centroids=8, iters=2, seed=131)
    book_g = train_pq_codebook(df, m=4, ksub=8, iters=3, seed=151)
    book_r = train_pq_codebook(df, m=4, ksub=8, iters=3, seed=151,
                               coarse=cen)
    local = {i: vecs[i].astype(np.float64) for i in range(400)}
    got_g = pq_topk(df, df.where("vec_id < 8"), k=10, codebook=book_g,
                    coarse_centroids=cen, nprobe=8).collect()
    got_r = pq_topk(df, df.where("vec_id < 8"), k=10, codebook=book_r,
                    coarse_centroids=cen, nprobe=8,
                    by_residual=True).collect()
    rg = _recall_at_10(got_g, local, 8)
    rr = _recall_at_10(got_r, local, 8)
    assert rr > rg, (rr, rg)
    assert rr >= 0.45, rr


def test_pq_by_residual_requires_coarse(spark, emb):
    import pytest as _pytest

    from lidartree_spark.operators.similarity import pq_topk
    with _pytest.raises(ValueError):
        pq_topk(emb, emb.where("vec_id < 2"), by_residual=True)
