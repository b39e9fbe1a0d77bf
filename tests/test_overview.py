"""build_overview: parent tiles equal an independent numpy reference
downsample of the REAL generator corpus (including NaN patches and the
png16 quantization); oracle parity is in tests/test_extended_oracles.py."""

import numpy as np

from lidartree_spark.codecs import decode_tile
from lidartree_spark.generator import gen_tile_row
from lidartree_spark.operators.tiles import build_overview, synthetic_tiles


def _ref_parent(prow, pcol, w=64, h=64):
    canvas = np.full((2 * h, 2 * w), np.nan, dtype=np.float64)
    for dr in (0, 1):
        for dc in (0, 1):
            rec = gen_tile_row(2 * prow + dr, 2 * pcol + dc)
            arr = decode_tile(rec["bytes"], rec["fmt"], w, h)
            canvas[dr * h:(dr + 1) * h, dc * w:(dc + 1) * w] = arr
    blocks = canvas.reshape(h, 2, w, 2).transpose(0, 2, 1, 3).reshape(h, w, 4)
    with np.errstate(invalid="ignore"):
        down = np.nanmean(blocks, axis=2)
    # the operator re-encodes png16: snap to its 1/256 grid for comparison
    q = np.round(np.nan_to_num(down, nan=0.0) * 256.0)
    q = np.clip(q, 0, 0xFFFE)
    snapped = (q / 256.0).astype(np.float32)
    snapped[np.isnan(down)] = np.nan
    return snapped


def test_overview_matches_numpy_reference(spark):
    tiles = synthetic_tiles(spark, 4, 4)
    parents = {r["image_id"]: r for r in build_overview(tiles).collect()}
    assert sorted(parents) == [f"p{r:04d}_{c:04d}"
                               for r in range(2) for c in range(2)]
    for pr in range(2):
        for pc in range(2):
            rec = parents[f"p{pr:04d}_{pc:04d}"]
            assert (rec["w"], rec["h"], rec["fmt"]) == (64, 64, "png16")
            got = decode_tile(rec["bytes"], rec["fmt"], 64, 64)
            want = _ref_parent(pr, pc)
            assert np.array_equal(np.isnan(got), np.isnan(want))
            np.testing.assert_allclose(np.nan_to_num(got),
                                       np.nan_to_num(want), atol=1 / 512)
