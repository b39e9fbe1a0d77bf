"""points_to_tiles round-trip and tree-metrics aggregate tests."""

import numpy as np
import pandas as pd
import pytest

from lidartree_spark.codecs import decode_tile
from lidartree_spark.kernels.stats import gini
from lidartree_spark.operators.rasterize import (
    clouds_tree_metrics_df,
    points_to_tiles,
    std_tree_metrics_df,
)
from lidartree_spark.operators.tiles import synthetic_tiles
from lidartree_spark.operators.detection import detect_trees


def test_points_to_tiles_roundtrip(spark):
    """Plant one point per cell of a known 64x64 tile; the assembled tile
    must reproduce the values at the right pixels."""
    res, n = 0.5, 64
    rng = np.random.default_rng(5)
    rows = []
    expected = np.full((n, n), np.nan, dtype=np.float32)
    for _ in range(500):
        px, py = int(rng.integers(0, n)), int(rng.integers(0, n))
        z = float(rng.uniform(1, 30))
        # two points per cell sometimes -> max wins
        rows.append({"x": (px + 0.3) * res, "y": (py + 0.6) * res, "z": z})
        expected[n - 1 - py, px] = np.fmax(
            np.float32(z), expected[n - 1 - py, px])
    pts = spark.createDataFrame(pd.DataFrame(rows))
    tiles = points_to_tiles(pts, res=res, tile_px=n).collect()
    assert len(tiles) == 1
    rec = tiles[0]
    assert rec.image_id == "t0000_0000"
    arr = decode_tile(rec.bytes, "raw_f32", rec.w, rec.h)
    m = ~np.isnan(expected)
    assert np.allclose(arr[m], expected[m], rtol=1e-6)
    assert np.isnan(arr[~m]).all()


def test_points_to_tiles_multi_tile(spark):
    pts = spark.createDataFrame(pd.DataFrame([
        {"x": 1.0, "y": 1.0, "z": 5.0},     # tile (0,0)
        {"x": 33.0, "y": 1.0, "z": 6.0},    # tile col 1
        {"x": 1.0, "y": 40.0, "z": 7.0},    # tile row 1
    ]))
    ids = sorted(r.image_id for r in points_to_tiles(pts).collect())
    assert ids == ["t0000_0000", "t0000_0001", "t0001_0000"]


def test_std_tree_metrics_matches_kernel(spark):
    det = detect_trees(synthetic_tiles(spark, 2, 2))
    got = {r.image_id: r for r in
           std_tree_metrics_df(det, area_ha=0.1024).collect()}
    pdf = det.toPandas()
    for image_id, sub in pdf.groupby("image_id"):
        h = sub.h.to_numpy()
        r = got[image_id]
        assert r.tree_meanh == pytest.approx(h.mean())
        assert r.tree_ginih == pytest.approx(gini(h), rel=1e-9)
        assert r.tree_density == pytest.approx(len(h) / 0.1024)
        assert r.treecanopy_meanh == pytest.approx(
            sub.v.sum() / sub.s.sum())


def test_clouds_tree_metrics(spark):
    out = clouds_tree_metrics_df(synthetic_tiles(spark, 2, 2)).collect()
    assert len(out) == 4
    for r in out:
        assert 5.0 < r.tree_meanh < 40.0
        assert 0.0 <= r.tree_ginih < 1.0


def test_raster_metrics_apply_arbitrary_fun(spark):
    """User-function re-gridding (raster_metrics.R:86): per-cell trimmed
    mean — not expressible as a built-in agg — must match a pandas oracle
    using the same snap formula."""
    rng = np.random.default_rng(44)
    pdf_in = pd.DataFrame({
        "x": rng.uniform(0, 200, 800),
        "y": rng.uniform(0, 200, 800),
        "z": rng.uniform(0, 30, 800),
    })
    from lidartree_spark.operators.rasterize import raster_metrics_apply

    def trimmed(key, pdf):
        z = np.sort(pdf["z"].to_numpy())
        k = max(1, int(len(z) * 0.1))
        core = z[k:-k] if len(z) > 2 * k else z
        return pd.DataFrame([{"gx": float(key[0]), "gy": float(key[1]),
                              "tmean": float(core.mean()),
                              "n": len(z)}])

    got = {(r.gx, r.gy): (r.tmean, r.n)
           for r in raster_metrics_apply(
               spark.createDataFrame(pdf_in), trimmed,
               "gx double, gy double, tmean double, n long",
               res=50.0).collect()}

    res, start = 50.0, 0.0
    snap = lambda v: np.round((v - start - res / 2) / res) * res + start + res / 2
    pdf_in["gx"] = snap(pdf_in.x)
    pdf_in["gy"] = snap(pdf_in.y)
    for (gx, gy), grp in pdf_in.groupby(["gx", "gy"]):
        z = np.sort(grp.z.to_numpy())
        k = max(1, int(len(z) * 0.1))
        core = z[k:-k] if len(z) > 2 * k else z
        assert got[(gx, gy)][1] == len(z)
        assert got[(gx, gy)][0] == pytest.approx(core.mean())


def test_clouds_metrics_generic(spark):
    from lidartree_spark.operators.rasterize import clouds_metrics
    pdf_in = pd.DataFrame({
        "cloud_id": [i % 4 for i in range(200)],
        "z": [float(i % 37) for i in range(200)],
    })

    def metrics(key, pdf):
        z = pdf["z"].to_numpy()
        return pd.DataFrame([{"cloud_id": int(key[0]),
                              "zmax": float(z.max()),
                              "zmean": float(z.mean())}])

    out = {r.cloud_id: (r.zmax, r.zmean)
           for r in clouds_metrics(spark.createDataFrame(pdf_in), metrics,
                                   "cloud_id long, zmax double, zmean double"
                                   ).collect()}
    for cid, grp in pdf_in.groupby("cloud_id"):
        assert out[cid][0] == grp.z.max()
        assert out[cid][1] == pytest.approx(grp.z.mean())
