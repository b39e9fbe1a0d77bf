"""TIN / points2DTM tests: Delaunay property, planar exactness, halo
equivalence of the distributed operator, and CHM normalization."""

import numpy as np
import pandas as pd

from lidartree_spark.codecs import decode_tile, encode_tile, phash64
from lidartree_spark.kernels.tin import _circumcircles, delaunay, tin_interpolate
from lidartree_spark.operators.rasterize import (
    normalize_tiles,
    points_to_dtm_tiles,
)


def test_delaunay_empty_circumcircle():
    """Defining property: no input point strictly inside any triangle's
    circumcircle."""
    rng = np.random.default_rng(11)
    for n in (10, 120, 500):
        pts = rng.uniform(0, 50, (n, 2))
        tris = delaunay(pts)
        assert len(tris) >= n - 2  # triangulation covers the hull
        centers, r2 = _circumcircles(pts, tris.astype(np.int64))
        for i in range(len(tris)):
            d2 = ((pts - centers[i]) ** 2).sum(1)
            inside = d2 < r2[i] * (1 - 1e-9)
            inside[tris[i]] = False
            assert not inside.any()


def test_delaunay_row_order_invariant():
    """Same point SET -> same triangle set (unique Delaunay in general
    position), regardless of input row order."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 30, (80, 2))
    perm = rng.permutation(80)
    t1 = delaunay(pts)
    t2 = delaunay(pts[perm])
    as_coords = lambda pp, tt: sorted(
        tuple(sorted(map(tuple, pp[t].round(9)))) for t in tt)
    assert as_coords(pts, t1) == as_coords(pts[perm], t2)


def test_tin_planar_exact():
    """Linear interpolation of planar data is exact for ANY triangulation —
    pins barycentric weights + grid orientation."""
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 100, (300, 2))
    z = 5.0 + 0.25 * pts[:, 0] - 0.5 * pts[:, 1]
    gx = np.linspace(10, 90, 40)
    gy = np.linspace(90, 10, 40)  # descending: row 0 = top
    grid = tin_interpolate(pts, z, gx, gy)
    expected = 5.0 + 0.25 * gx[None, :] - 0.5 * gy[:, None]
    m = ~np.isnan(grid)  # cells outside the convex hull stay NA
    assert m.mean() > 0.99
    assert np.allclose(grid[m], expected[m], atol=1e-9)


def test_points_to_dtm_tiles_matches_global_tin(spark):
    """Per-tile TIN with point halo == one global TIN on interior cells
    (the reference's chunk-buffer contract, common.R:105-123 +
    tree_detection.R:114-115)."""
    res, tile_px, side = 0.5, 64, 2
    span = tile_px * res
    rng = np.random.default_rng(9)
    n = 1500
    xy = rng.uniform(0, side * span, (n, 2))
    z = 100.0 + 3.0 * np.sin(xy[:, 0] / 7.0) + 2.0 * np.cos(xy[:, 1] / 5.0)
    pts = spark.createDataFrame(
        pd.DataFrame({"x": xy[:, 0], "y": xy[:, 1], "z": z}))

    tiles = {r.image_id: r
             for r in points_to_dtm_tiles(pts, res=res, tile_px=tile_px,
                                          halo_m=8.0).collect()}
    assert len(tiles) == side * side

    # global oracle over the full mosaic
    gx = (np.arange(side * tile_px) + 0.5) * res
    gy = (side * span) - (np.arange(side * tile_px) + 0.5) * res
    global_grid = tin_interpolate(xy, z, gx, gy)

    mosaic = np.full_like(global_grid, np.nan)
    for row in range(side):
        for col in range(side):
            rec = tiles[f"t{row:04d}_{col:04d}"]
            arr = decode_tile(rec.bytes, rec.fmt, rec.w, rec.h)
            i0 = (side - 1 - row) * tile_px
            mosaic[i0:i0 + tile_px, col * tile_px:(col + 1) * tile_px] = arr
    # interior = 10 m from the domain edge (inside the global hull, and every
    # local triangle there is covered by the 8 m halo)
    m = 20  # 10 m / 0.5 m
    a = mosaic[m:-m, m:-m]
    b = global_grid[m:-m, m:-m]
    both = ~np.isnan(a) & ~np.isnan(b)
    assert both.mean() > 0.99
    assert np.allclose(a[both], b[both], atol=1e-4)  # f32 encode tolerance


def test_normalize_tiles_chm(spark):
    """CHM = DSM - DTM, clamped at 0, NaN-propagating
    (tree_detection.R:178-182 normalize_height semantics)."""
    rng = np.random.default_rng(21)
    dtm_a = 100.0 + rng.uniform(0, 5, (64, 64)).astype(np.float32)
    canopy = np.maximum(rng.uniform(-2, 20, (64, 64)), 0).astype(np.float32)
    dsm_a = dtm_a + canopy - 1.0  # some cells dip below ground -> clamp
    dsm_a[0, 0] = np.nan

    def tile_df(arr, cap):
        return spark.createDataFrame(pd.DataFrame([{
            "image_id": "t0000_0000", "bytes": encode_tile(arr, "raw_f32"),
            "w": 64, "h": 64, "fmt": "raw_f32", "caption": cap,
            "phash": phash64(np.nan_to_num(arr)),
        }]))

    out = normalize_tiles(tile_df(dsm_a, "dsm cap"),
                          tile_df(dtm_a, "dtm")).collect()
    assert len(out) == 1
    rec = out[0]
    assert rec.caption == "dsm cap"  # caption preserved verbatim (input_hint)
    chm = decode_tile(rec.bytes, "raw_f32", 64, 64)
    expected = np.maximum(dsm_a - dtm_a, 0.0)
    assert np.isnan(chm[0, 0])
    m = ~np.isnan(expected)
    assert np.allclose(chm[m], expected[m], atol=1e-5)
