"""Spatially-clustered parquet layout — the Hilbert analog of Delta's
Z-ORDER / Iceberg's sort-order rewrite, built from the engine's own cell
index (operators/grid.with_hilbert).

Why this matters at 100 TB: parquet pruning is only as good as the
min/max statistics of what each file/row-group happens to contain. A
hash-partitioned write scatters every spatial region across every file,
so each row group's (x, y) stats span the whole domain and a bbox
predicate prunes NOTHING — the scan reads all 100 TB to answer a
1 km² query. Range-partitioning + sorting on the Hilbert code puts
spatially compact runs into each file (consecutive Hilbert codes are
grid 4-neighbors), so per-row-group (x, y) stats become tight boxes and
the ordinary Catalyst pushdown (`PushedFilters: [GreaterThanOrEqual(x..`)
skips the row groups that cannot match — no new reader, no index
structure, just file layout.

`rowgroup_prune_stats` makes the effect measurable from the parquet
footers themselves — the exact min/max stats Spark's scan consults —
so tests pin the pruning ratio instead of trusting the narrative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lidartree_spark.operators.grid import with_hilbert


def write_clustered(df: DataFrame, path: str, x_col: str = "x",
                    y_col: str = "y", res: float = 0.5,
                    n_files: int | None = None,
                    order: int | None = None) -> None:
    """Write `df` as parquet clustered on the Hilbert curve: ONE range
    shuffle on the code (each output file owns a contiguous — hence
    spatially compact — code interval) + an in-partition sort (row groups
    within a file are compact sub-runs). The hcode column is dropped
    before writing; clustering lives in the physical order, queries keep
    filtering on plain (x, y).
    """
    kw = {"order": order} if order is not None else {}
    d = with_hilbert(df, F.col(x_col), F.col(y_col), res=res,
                     out="__hcode", **kw)
    n = n_files or d.sparkSession.conf.get("spark.sql.shuffle.partitions")
    (d.repartitionByRange(int(n), "__hcode")
      .sortWithinPartitions("__hcode")
      .drop("__hcode")
      .write.mode("overwrite").parquet(path))


def bbox_scan(spark: SparkSession, path: str, xmin: float, ymin: float,
              xmax: float, ymax: float, x_col: str = "x",
              y_col: str = "y") -> DataFrame:
    """Plain sargable bbox filter over a parquet directory — the
    predicates reach the scan as PushedFilters and do row-group skipping
    against the footer stats; on a clustered layout that skips almost
    everything outside the box."""
    return (spark.read.parquet(path)
            .where((F.col(x_col) >= xmin) & (F.col(x_col) < xmax)
                   & (F.col(y_col) >= ymin) & (F.col(y_col) < ymax)))


def rowgroup_prune_stats(path: str, xmin: float, ymin: float, xmax: float,
                         ymax: float, x_col: str = "x",
                         y_col: str = "y") -> dict:
    """Read every parquet footer under `path` and count row groups whose
    (x, y) min/max stats intersect the bbox — i.e. the row groups a
    stats-based scan MUST read; the rest are prunable. Driver-side
    (footers are metadata-sized); returns {'total': .., 'must_read': ..}.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    total = must_read = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i
                 for i in range(len(md.schema))}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sx = rg.column(names[x_col]).statistics
            sy = rg.column(names[y_col]).statistics
            total += 1
            if (sx is None or sy is None
                    or not sx.has_min_max or not sy.has_min_max):
                must_read += 1  # no (or min/max-less) stats -> cannot prune
                continue
            if (sx.max >= xmin and sx.min < xmax
                    and sy.max >= ymin and sy.min < ymax):
                must_read += 1
    return {"total": total, "must_read": must_read}
