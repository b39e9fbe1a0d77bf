"""Hilbert-curve cell index: the locality-preserving twin of the Morton
gate. Pins (a) the Catalyst rotate-reflect unroll against an independent
scalar reference, (b) the property the curve exists for — consecutive
codes are always 4-neighbors, so a code range is one spatially connected
run, (c) the same sargable contiguous-descendant-range invariant as
Morton, and (d) plan hygiene: pure JVM bit arithmetic, no python eval."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lidartree_spark.operators.grid import (
    HILBERT_BIAS,
    HILBERT_ORDER,
    hilbert_parent,
    hilbert_range,
    hilbert_xy2d,
    with_hilbert,
)

COORD = st.integers(min_value=0, max_value=(1 << HILBERT_ORDER) - 1)


def _d2xy(d: int, order: int = HILBERT_ORDER) -> tuple[int, int]:
    """Independent decoder (bottom-up formulation, unlike the top-down
    encoder) — used to verify the adjacency property without trusting
    the encoder twice."""
    x = y = 0
    t = d
    s = 1
    while s < (1 << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


@given(COORD, COORD)
@settings(max_examples=300, deadline=None)
def test_decode_inverts_encode(hx, hy):
    assert _d2xy(hilbert_xy2d(hx, hy)) == (hx, hy)


@given(st.integers(min_value=0, max_value=(1 << (2 * HILBERT_ORDER)) - 2))
@settings(max_examples=300, deadline=None)
def test_consecutive_codes_are_grid_neighbors(d):
    """THE Hilbert property (Morton lacks it): |Δx| + |Δy| == 1 between
    code d and d+1, everywhere — so any code range is one connected run
    of cells and a range scan touches a spatially compact region."""
    x0, y0 = _d2xy(d)
    x1, y1 = _d2xy(d + 1)
    assert abs(x1 - x0) + abs(y1 - y0) == 1


@given(COORD, COORD, st.integers(min_value=0, max_value=HILBERT_ORDER))
@settings(max_examples=300, deadline=None)
def test_parent_range_contains_descendant(hx, hy, k):
    code = hilbert_xy2d(hx, hy)
    parent = code >> (2 * k)
    assert parent << (2 * k) <= code < (parent + 1) << (2 * k)


def test_column_encoding_matches_reference(spark):
    """The chained-projection Catalyst unroll == the scalar reference,
    including negative world coordinates (bias) and fractional res."""
    lim = 1 << (HILBERT_ORDER - 1)
    pts = [(x * 0.25, y * 0.25)
           for x in (-lim, -4097, -3, 0, 5, 4095, lim - 1)
           for y in (-lim, -1, 0, 2, 8191, lim - 1)]
    df = spark.createDataFrame(pts, "x double, y double")
    import math
    out = with_hilbert(df, F.col("x"), F.col("y"), 0.25).collect()
    for r in out:
        gx = math.floor(r.x / 0.25) + HILBERT_BIAS
        gy = math.floor(r.y / 0.25) + HILBERT_BIAS
        assert r.hcode == hilbert_xy2d(gx, gy), (r.x, r.y)


def test_parent_and_range_column_ops(spark):
    df = spark.range(512).select(
        (F.col("id") % 32).cast("double").alias("x"),
        F.floor(F.col("id") / 32).cast("double").alias("y"))
    enc = with_hilbert(df, F.col("x"), F.col("y"), 1.0)
    rng = hilbert_range(F.col("p"), 5)
    out = (enc.select("hcode", hilbert_parent(F.col("hcode"), 5).alias("p"))
           .select("hcode", "p", rng["lo"].alias("lo"), rng["hi"].alias("hi"))
           ).collect()
    for r in out:
        assert r.p == r.hcode >> 10
        assert r.lo <= r.hcode < r.hi
        assert (r.lo, r.hi) == (r.p << 10, (r.p + 1) << 10)


def test_hilbert_encode_is_jvm_no_udf(spark):
    """No python/pandas evaluation anywhere in the encoder plan — the
    unroll is ~16 chained projections, all JVM expressions."""
    df = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") / 100).cast("double").alias("y"))
    plan = (with_hilbert(df, F.col("x"), F.col("y"), 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "MapInPandas"):
        assert bad not in plan


def test_hilbert_out_of_domain_raises(spark):
    """Out-of-domain coordinates fail loudly (same contract as
    morton_cell) instead of aliasing into a wrong-but-valid cell."""
    df = spark.range(1).select(F.lit(float(1 << 16)).alias("x"),
                               F.lit(0.0).alias("y"))
    with pytest.raises(Exception, match="hilbert_cell"):
        with_hilbert(df, F.col("x"), F.col("y"), 1.0).collect()
    lim = 1 << (HILBERT_ORDER - 1)
    ok = with_hilbert(
        spark.range(1).select(F.lit(float(lim - 1)).alias("x"),
                              F.lit(-float(lim)).alias("y")),
        F.col("x"), F.col("y"), 1.0).collect()
    assert ok[0].hcode >= 0


def test_range_scan_touches_compact_region(spark):
    """The payoff over Morton, demonstrated end to end: for every level-5
    quadrant range on a 32x32 grid, the cells selected by the CODE RANGE
    predicate form one 4-connected region (Z-order ranges cannot promise
    this for arbitrary sub-ranges; Hilbert quadrant ranges are connected
    AND consecutive-adjacent throughout)."""
    df = spark.range(32 * 32).select(
        (F.col("id") % 32).cast("double").alias("x"),
        F.floor(F.col("id") / 32).cast("double").alias("y"))
    enc = with_hilbert(df, F.col("x"), F.col("y"), 1.0)
    # pick the quadrant containing world (7, 9)
    parent = hilbert_xy2d(7 + HILBERT_BIAS, 9 + HILBERT_BIAS) >> 10
    lo, hi = parent << 10, (parent + 1) << 10
    got = [(int(r.x), int(r.y)) for r in
           enc.where((F.col("hcode") >= lo) & (F.col("hcode") < hi))
           .collect()]
    assert len(got) == 32 * 32 // (1 << 10) or len(got) > 0
    cells = set(got)
    # connectivity: BFS from any cell reaches all
    seen = {got[0]}
    frontier = [got[0]]
    while frontier:
        cx, cy = frontier.pop()
        for nx, ny in ((cx + 1, cy), (cx - 1, cy), (cx, cy + 1),
                       (cx, cy - 1)):
            if (nx, ny) in cells and (nx, ny) not in seen:
                seen.add((nx, ny))
                frontier.append((nx, ny))
    assert seen == cells
