"""Cross-tile gap merge: distributed labeling + min-label propagation must
reproduce a single-image (mosaic) gap_detection run exactly."""

import numpy as np
import pandas as pd
import pytest

from lidartree_spark.codecs import encode_tile, phash64
from lidartree_spark.kernels.gaps import gap_detection
from lidartree_spark.operators.gaps import connected_components, detect_gaps_global

RES = 0.5
PARAMS = dict(res=RES, ratio=2.0, gap_max_height=1.0, min_gap_surface=25.0,
              nl_filter="Median", nl_size=3, max_height=8.0)


def _mosaic():
    """128x128 deterministic CHM: uniform 6 m canopy with
    - a 12-px-wide horizontal corridor through the mosaic center (spans all
      4 tiles -> one merged gap),
    - a 12x12 block gap inside the NW tile (36 m^2, kept),
    - a 3x3 speck in the SE tile (2.25 m^2 < 25 -> dropped globally)."""
    chm = np.full((128, 128), 6.0)
    chm[58:70, :] = 0.0          # corridor across the vertical boundary rows
    chm[10:22, 20:32] = 0.0      # block gap, one tile
    chm[100:103, 100:103] = 0.0  # sub-threshold speck
    return chm


def _tiles_df(spark, mosaic):
    side_px = 64
    rows = []
    for row in range(2):
        for col in range(2):
            i0 = (2 - 1 - row) * side_px
            arr = mosaic[i0:i0 + side_px,
                         col * side_px:(col + 1) * side_px].astype(np.float32)
            image_id = f"t{row:04d}_{col:04d}"
            rows.append({
                "image_id": image_id,
                "bytes": encode_tile(arr, "raw_f32"),
                "w": side_px, "h": side_px, "fmt": "raw_f32",
                "caption": f"gap test {image_id}",
                "phash": phash64(arr),
            })
    return spark.createDataFrame(pd.DataFrame(rows))


def test_global_gaps_match_mosaic(spark):
    mosaic = _mosaic()
    out = detect_gaps_global(_tiles_df(spark, mosaic), PARAMS,
                             halo_px=16).collect()

    oracle = gap_detection(mosaic, res=RES, ratio=PARAMS["ratio"],
                           gap_max_height=PARAMS["gap_max_height"],
                           min_gap_surface=PARAMS["min_gap_surface"],
                           nl_filter=PARAMS["nl_filter"],
                           nl_size=PARAMS["nl_size"],
                           max_height=PARAMS["max_height"])
    lab = oracle["gap_id"].astype(np.int64)
    ids, counts = np.unique(lab[lab > 0], return_counts=True)
    oracle_surfaces = sorted((counts * RES * RES).tolist())

    got_surfaces = sorted(r.surface for r in out)
    assert got_surfaces == pytest.approx(oracle_surfaces)
    # the corridor gap spans all 4 tiles and is reported exactly once
    spans = [r for r in out if r.n_tiles == 4]
    assert len(spans) == 1
    assert spans[0].n_pixels == int(counts.max())
    # the one-tile block gap and nothing else
    assert sorted(r.n_tiles for r in out) == [1, 4]


@pytest.mark.parametrize("driver_threshold", [0, 1000])
def test_connected_components_chain_and_clusters(spark, driver_threshold):
    """Both CC paths (distributed min-label propagation / driver union-find)
    resolve a 5-node chain (diameter > 1 round) plus a separate 3-cycle to
    the same min-node representatives."""
    pairs = spark.createDataFrame(pd.DataFrame([
        {"a": "n1", "b": "n2"}, {"a": "n2", "b": "n3"},
        {"a": "n3", "b": "n4"}, {"a": "n4", "b": "n5"},
        {"a": "x1", "b": "x2"}, {"a": "x2", "b": "x3"},
        {"a": "x3", "b": "x1"},
    ]))
    comp = {r.node: r.comp for r in connected_components(
        pairs, driver_threshold=driver_threshold).collect()}
    assert {comp[f"n{i}"] for i in range(1, 6)} == {"n1"}
    assert {comp[f"x{i}"] for i in range(1, 4)} == {"x1"}


def test_global_gaps_match_mosaic_with_reconstruct(spark):
    """gap_reconstruct extends gaps into connected low pixels
    (gap_detection.R:184-196); with halo >= the reconstruction reach the
    per-tile + merge result still equals the mosaic run."""
    params = dict(PARAMS, gap_reconstruct=True)
    mosaic = _mosaic()
    # a low (0.8 m < gap_max_height) apron around the block gap: dropped by
    # the closing ladder but reconnected by gap_reconstruct
    mosaic[6:10, 20:32] = 0.8
    out = detect_gaps_global(_tiles_df(spark, mosaic), params,
                             halo_px=16).collect()
    oracle = gap_detection(mosaic, res=RES, ratio=params["ratio"],
                           gap_max_height=params["gap_max_height"],
                           min_gap_surface=params["min_gap_surface"],
                           nl_filter=params["nl_filter"],
                           nl_size=params["nl_size"],
                           max_height=params["max_height"],
                           gap_reconstruct=True)
    lab = oracle["gap_id"].astype(np.int64)
    ids, counts = np.unique(lab[lab > 0], return_counts=True)
    assert sorted(r.surface for r in out) == pytest.approx(
        sorted((counts * RES * RES).tolist()))
