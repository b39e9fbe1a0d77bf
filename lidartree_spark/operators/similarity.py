"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k (the baseline; also expressed in pure
  SQL as queries.py `embedding_topk` with a DuckDB oracle).
- lsh_topk: the scale path — sign-random-projection LSH with L independent
  hash tables. Hashing is a vectorized numpy matmul per Arrow batch
  (mapInPandas); candidates come from one equi-join on (table, bucket);
  exact cosine rerank + window top-k. At 10^12 rows the only shuffle is the
  bucket join, whose build side (the query set) is broadcast.

Planes are seeded deterministically, so hashing is reproducible across
executors and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _planes(dim: int, n_tables: int, n_bits: int, seed: int = 97) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_tables, n_bits, dim))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the query set, JVM-side zip_with dot
    product (no Python in the hot path), window top-k."""
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qv"))
    b = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("bv"))
    dot = F.aggregate(F.zip_with("qv", "bv", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    nrm = (F.sqrt(F.aggregate(F.transform("qv", lambda x: x * x),
                              F.lit(0.0), lambda a, v: a + v))
           * F.sqrt(F.aggregate(F.transform("bv", lambda x: x * x),
                                F.lit(0.0), lambda a, v: a + v)))
    scored = (b.join(F.broadcast(q), F.col("qid") != F.col("vec_id"))
              .withColumn("cosine", dot / nrm))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("qid", "vec_id", "rk", "cosine"))


def _bucketize(df: DataFrame, id_col: str, vec_col: str, n_tables: int,
               n_bits: int, seed: int) -> DataFrame:
    out_schema = f"{id_col} long, table int, bucket long"

    def run(batches):
        planes = None
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy())
            if planes is None:
                planes = _planes(vecs.shape[1], n_tables, n_bits, seed)
            rows = []
            weights = (1 << np.arange(n_bits)).astype(np.int64)
            for t in range(n_tables):
                bits = (vecs @ planes[t].T) > 0  # (n, n_bits)
                buckets = bits.astype(np.int64) @ weights
                rows.append(pd.DataFrame({
                    id_col: pdf[id_col].to_numpy(),
                    "table": t, "bucket": buckets}))
            yield pd.concat(rows, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(run, schema=out_schema)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_tables: int = 32, n_bits: int = 6, seed: int = 97,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates = union over L tables of same-bucket
    rows, exact cosine rerank. Recall grows with n_tables (see
    tests/test_similarity.py for the measured recall floor)."""
    qb = _bucketize(queries, id_col, vec_col, n_tables, n_bits, seed) \
        .withColumnRenamed(id_col, "qid")
    bb = _bucketize(embeddings, id_col, vec_col, n_tables, n_bits, seed)
    cand = (bb.join(F.broadcast(qb), ["table", "bucket"])
            .where(F.col("qid") != F.col(id_col))
            .select("qid", id_col).distinct())
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    b = embeddings.select(id_col, F.col(vec_col).alias("bv"))
    dot = F.aggregate(F.zip_with("qv", "bv", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    nrm = (F.sqrt(F.aggregate(F.transform("qv", lambda x: x * x),
                              F.lit(0.0), lambda a, v: a + v))
           * F.sqrt(F.aggregate(F.transform("bv", lambda x: x * x),
                                F.lit(0.0), lambda a, v: a + v)))
    scored = (cand.join(b, id_col).join(F.broadcast(q), "qid")
              .withColumn("cosine", dot / nrm))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("qid", id_col, "rk", "cosine"))
