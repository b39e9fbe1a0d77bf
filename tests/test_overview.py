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


def test_overview_wide_ids_and_bad_id(spark):
    """ids with >= 5-digit rows/cols parse by regex (a fixed-position
    substring parse would truncate digits and group children under the
    wrong parent); unparseable ids fail loudly."""
    import pandas as pd
    import pytest

    from lidartree_spark.codecs import encode_tile

    def tile(r, c, val):
        arr = np.full((4, 4), float(val), dtype=np.float32)
        return {"image_id": f"t{r:04d}_{c:04d}",
                "bytes": encode_tile(arr, "raw_f32"),
                "w": 4, "h": 4, "fmt": "raw_f32"}

    # two parents far apart: (row 20000..20001, col 6) and (row 0, col 6)
    # — substring-truncated parsing would merge 20000 with 2000x garbage
    rows = [tile(20000, 6, 1.0), tile(20001, 7, 3.0), tile(0, 6, 9.0)]
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    parents = {r["image_id"]: r for r in build_overview(tiles).collect()}
    assert sorted(parents) == ["p0000_0003", "p10000_0003"]
    top = decode_tile(parents["p10000_0003"]["bytes"], "png16", 4, 4)
    assert np.nanmean(top) != 9.0  # the row-0 tile went to its own parent

    bad = spark.createDataFrame(pd.DataFrame([
        {**tile(0, 0, 1.0), "image_id": "tile_weird"}]))
    with pytest.raises(Exception, match="unparseable tile id"):
        build_overview(bad).collect()
