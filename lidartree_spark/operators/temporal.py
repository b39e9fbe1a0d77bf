"""Temporal joins: the distributed merge as-of join.

Spark has no ASOF JOIN operator; the naive relational encodings are either
a range join (per-key row explosion, O(n*m) worst case) or a correlated
subquery (nested loop). This module implements the classic merge formulation
as a composition of built-in operators: union-tag both sides, ONE shuffle on
the join key, and a single running `last(ignorenulls)` window over the
time-sorted stream — O(n log n) per key partition, no explosion, AQE
skew-split applies to hot keys like any other keyed shuffle. The matched
right row is carried as ONE struct so its columns can never mix values from
different rows (a per-column last() would, whenever a right attribute is
legitimately NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str,
              right_id: str) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `right_time` <= `left_time` for the same `on` key (left join: right
    columns are NULL when no prior right row exists). Ties at equal
    timestamps resolve to the right row (<= semantics), and among several
    right rows sharing (key, time) to the greatest `right_id` —
    deterministic for any input.

    Column contract: `right`'s non-key column names must not collide with
    `left`'s (rename before calling). Returns left columns + right non-key
    columns.

    NULL-time semantics (standard left-join treatment of an inequality
    that is never true on NULL): a RIGHT row with NULL `right_time` is
    dropped — it carries no "as of" instant, so it can never satisfy
    right_time <= left_time (unfiltered it would sort nulls-first and
    become permanently matchable state). A LEFT row with NULL `left_time`
    SURVIVES with NULL right columns — it is still a left row; it just
    matches nothing (nulls-first ordering places it before every right
    row, so the running last() sees only NULLs). Note this deliberately
    differs from DuckDB's native ASOF JOIN, whose NULL handling is
    engine-specific; the oracle gate feeds NULL-free times.
    """
    right = right.where(F.col(right_time).isNotNull())
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    lstruct = F.struct(*[F.col(c) for c in lcols]).alias("_l")
    rstruct = F.struct(*[F.col(c) for c in rcols]).alias("_r")
    ltype = left.select(lstruct).schema["_l"].dataType
    rtype = right.select(rstruct).schema["_r"].dataType

    l2 = left.select(
        F.col(on).alias("_k"), F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"), lstruct,
        F.lit(None).cast(rtype).alias("_r"))
    r2 = right.select(
        F.col(on).alias("_k"), F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"), F.lit(None).cast(ltype).alias("_l"),
        rstruct)
    u = l2.unionByName(r2)

    # right rows sort BEFORE left rows at equal _t (that is what makes the
    # join's time predicate <= rather than <); _r[right_id] is NULL for
    # left rows, which sorts consistently in one block
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_t"), F.col("_side"), F.col("_r")[right_id])
         .rowsBetween(Window.unboundedPreceding, 0))
    matched: Column = F.last("_r", ignorenulls=True).over(w)
    out = (u.withColumn("_m", matched)
           .where(F.col("_side") == 1))
    return out.select(*[F.col("_l")[c].alias(c) for c in lcols],
                      *[F.col("_m")[c].alias(c) for c in rcols])
