"""Hilbert-clustered parquet layout (operators/layout): correctness of
the clustered write + MEASURED row-group pruning from the parquet
footers — the same min/max stats Spark's scan consults."""

import pyspark.sql.functions as F

from lidartree_spark.operators.layout import (
    bbox_scan,
    rowgroup_prune_stats,
    write_clustered,
)

BBOX = (0.0, 0.0, 32.0, 32.0)  # 1/64 of the 256x256 domain area


def _points(spark, n=200_000):
    # deterministic hash-scatter over [0, 256)^2 — the worst case for an
    # unclustered layout (every file spans the whole domain)
    return spark.range(n).selectExpr(
        "id",
        "CAST(pmod(hash(id), 25600) AS DOUBLE) / CAST(100 AS DOUBLE) AS x",
        "CAST(pmod(hash(id + 7), 25600) AS DOUBLE) / CAST(100 AS DOUBLE)"
        " AS y",
        "CAST(id % 97 AS DOUBLE) AS z")


def test_clustered_scan_correct_and_prunes(spark, tmp_path):
    pts = _points(spark)
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    write_clustered(pts, clustered, res=0.5, n_files=32)
    pts.repartition(32, "id").write.mode("overwrite").parquet(scattered)

    # correctness: the clustered copy holds exactly the same rows, and the
    # bbox scan equals the direct filter on the source
    want = pts.where((F.col("x") >= BBOX[0]) & (F.col("x") < BBOX[2])
                     & (F.col("y") >= BBOX[1]) & (F.col("y") < BBOX[3]))
    got = bbox_scan(spark, clustered, *BBOX)
    w = want.agg(F.count("*"), F.sum("id"), F.sum("z")).collect()[0]
    g = got.agg(F.count("*"), F.sum("id"), F.sum("z")).collect()[0]
    assert tuple(w) == tuple(g)
    assert spark.read.parquet(clustered).count() == 200_000

    # the bbox predicates reach the scan (stats-based skipping engages)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(x" in plan

    # pruning evidence from the footers: the bbox covers 1/64 of the
    # domain; clustered row groups are compact so only a sliver must be
    # read, while every scattered row group spans the domain and NOTHING
    # can be pruned
    c = rowgroup_prune_stats(clustered, *BBOX)
    s = rowgroup_prune_stats(scattered, *BBOX)
    assert s["must_read"] == s["total"]  # hash layout: zero pruning
    assert c["total"] >= 32
    assert c["must_read"] * 4 <= c["total"], c  # >= 75% pruned


def test_clustered_rowgroups_are_spatially_tight(spark, tmp_path):
    """Each clustered file's (x, y) bounding box is a small fraction of
    the domain — the structural property pruning relies on."""
    import glob

    import pyarrow.parquet as pq
    path = str(tmp_path / "c2")
    write_clustered(_points(spark, 50_000), path, res=0.5, n_files=16)
    areas = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i
                 for i in range(len(md.schema))}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sx, sy = (rg.column(names["x"]).statistics,
                      rg.column(names["y"]).statistics)
            areas.append((sx.max - sx.min) * (sy.max - sy.min))
    domain = 256.0 * 256.0
    # median row-group box under 15% of the domain (hash layout: ~100%)
    areas.sort()
    assert areas[len(areas) // 2] < 0.15 * domain, areas[len(areas) // 2]
