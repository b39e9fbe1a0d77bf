"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship per-tile tree-detection pipeline (SURVEY.md §3.1)
queries()      -> operator registry (SURVEY.md §2) — see lidartree_spark.queries
oracle_sql()   -> DuckDB-equivalent SQL for the SQL-expressible operators
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: synthesize a deterministic
    tile grid sized from the testdata, run decode -> tree_segmentation ->
    tree_extraction per tile (zero-shuffle mapInPandas), match detections
    against the synthetic field inventory and return matched pairs joined
    with per-tile confusion counts."""
    from lidartree_spark.operators.detection import detect_trees
    from lidartree_spark.operators.matching import detection_counts, match_trees
    from lidartree_spark.operators.tiles import synthetic_ref_trees, synthetic_tiles

    sf_dir = "/root/testdata/sf0.001"
    # seed grid size from the testdata scale (keeps entry() tied to the input)
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    side = max(2, min(8, int(n_parts ** 0.5 // 16) or 2))
    tiles = synthetic_tiles(spark, side, side)
    det = detect_trees(tiles)
    ref = synthetic_ref_trees(spark, side, side)
    matched = match_trees(ref, det)
    counts = detection_counts(ref, det, matched)
    return matched.join(counts, "image_id", "left")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lidartree_spark.queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from lidartree_spark.queries import oracle_sql as _o
    return _o()
