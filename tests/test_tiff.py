"""GeoTIFF codec + distributed tile source/sink (lidartree_spark.tiff).

The raster interchange twin of the LAS/LAZ gates: lidaRtRee users hold
their CHM/DSM rasters as terra GeoTIFFs, so a migrating pipeline's first
step is `read_geotiff_tiles` and its last is `write_geotiff_tiles`.
"""

import struct

import numpy as np
import pytest

from lidartree_spark.tiff import (
    decode_geotiff,
    encode_geotiff,
    read_geotiff_tiles,
    write_geotiff_tiles,
)


def test_codec_roundtrip_f32_with_georef_caption_nodata():
    rng = np.random.default_rng(3)
    arr = rng.normal(10, 4, (48, 64)).astype(np.float32)
    arr[5, 7] = np.nan
    buf = encode_geotiff(arr, x0=128.0, y1=96.0, res=0.5,
                         caption="chm tile t0002_0004", nodata=-9999.0)
    back, geo = decode_geotiff(buf)
    assert back.dtype == np.float32 and back.shape == (48, 64)
    assert np.array_equal(back, arr, equal_nan=True)
    assert geo["x0"] == 128.0 and geo["y1"] == 96.0
    assert geo["res_x"] == 0.5 and geo["res_y"] == 0.5
    assert geo["caption"] == "chm tile t0002_0004"
    assert geo["nodata"] == -9999.0


def test_codec_roundtrip_uint16_and_uint8():
    a16 = (np.arange(32 * 16) * 7 % 65536).astype(np.uint16).reshape(32, 16)
    back, _ = decode_geotiff(encode_geotiff(a16, 0.0, 16.0, 1.0))
    assert back.dtype == np.uint16 and np.array_equal(back, a16)
    a8 = (np.arange(8 * 8, dtype=np.uint8)).reshape(8, 8)
    back8, _ = decode_geotiff(encode_geotiff(a8, 0.0, 8.0, 1.0))
    assert np.array_equal(back8, a8)


def test_big_endian_read():
    """A hand-rolled MM (big-endian) fixture decodes identically —
    GDAL and old toolchains both emit MM files."""
    h, w = 3, 4
    # build in native order, THEN cast: arithmetic on a >f4 array
    # silently promotes to native order and would write LE bytes
    arr = (np.arange(h * w).reshape(h, w) / 8).astype(">f4")
    entries = [
        (256, 4, 1, struct.pack(">I", w)),
        (257, 4, 1, struct.pack(">I", h)),
        (258, 3, 1, struct.pack(">H", 32) + b"\x00\x00"),
        (259, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
        (273, 4, 1, None),        # strip offset, patched
        (277, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
        (278, 4, 1, struct.pack(">I", h)),
        (279, 4, 1, struct.pack(">I", arr.nbytes)),
        (339, 3, 1, struct.pack(">H", 3) + b"\x00\x00"),
    ]
    n = len(entries)
    ifd_off = 8
    strip_off = ifd_off + 2 + 12 * n + 4
    body = struct.pack(">2sHI", b"MM", 42, ifd_off) + struct.pack(">H", n)
    for tag, typ, count, raw in entries:
        if raw is None:
            raw = struct.pack(">I", strip_off)
        body += struct.pack(">HHI", tag, typ, count) \
            + raw + b"\x00" * (4 - len(raw))
    body += struct.pack(">I", 0) + arr.tobytes()
    back, _ = decode_geotiff(body)
    assert back.dtype.byteorder in ("=", "<", "|")
    assert np.array_equal(back, arr.astype("<f4"))


def test_unsupported_variants_fail_loudly():
    arr = np.zeros((4, 4), np.float32)
    buf = bytearray(encode_geotiff(arr, 0.0, 2.0, 0.5))

    def patch_tag(b, tag, value):
        (n,) = struct.unpack_from("<H", b, 8)
        for i in range(n):
            base = 10 + 12 * i
            t, typ, count = struct.unpack_from("<HHI", b, base)
            if t == tag:
                struct.pack_into("<H", b, base + 8, value)
                return
        raise AssertionError(f"tag {tag} not found")

    lzw = bytearray(buf)
    patch_tag(lzw, 259, 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_geotiff(bytes(lzw))

    multi = bytearray(buf)
    patch_tag(multi, 277, 3)
    with pytest.raises(NotImplementedError, match="multi-sample"):
        decode_geotiff(bytes(multi))

    with pytest.raises(NotImplementedError, match="float32/uint16/uint8"):
        encode_geotiff(np.zeros((2, 2), np.int32), 0.0, 1.0, 0.5)

    with pytest.raises(ValueError, match="byte-order"):
        decode_geotiff(b"XX\x2a\x00garbage")


def test_distributed_roundtrip_and_detect(spark, tmp_path):
    """synthetic tiles -> write_geotiff_tiles -> read_geotiff_tiles
    reconstructs the SAME corpus (ids, pixels, captions), and detection
    on the GeoTIFF cycle equals detection on the originals."""
    from lidartree_spark.codecs import decode_tile
    from lidartree_spark.operators.detection import detect_trees
    from lidartree_spark.operators.tiles import synthetic_tiles

    tiles = synthetic_tiles(spark, 2, 2)
    d = str(tmp_path / "tifs")
    res = write_geotiff_tiles(tiles, d).collect()
    assert len(res) == 4 and all(r["path"].endswith(".tif") for r in res)

    back = read_geotiff_tiles(spark, d)
    orig = {r["image_id"]: r for r in tiles.collect()}
    got = {r["image_id"]: r for r in back.collect()}
    assert set(got) == set(orig)
    for tid, r in got.items():
        o = orig[tid]
        assert r["caption"] == o["caption"]
        a = decode_tile(r["bytes"], r["fmt"], r["w"], r["h"])
        b = decode_tile(o["bytes"], o["fmt"], o["w"], o["h"])
        assert np.allclose(a, b, equal_nan=True, atol=0)

    det_a = sorted(map(tuple, detect_trees(back).select(
        "image_id", "x", "y", "h").collect()))
    det_b = sorted(map(tuple, detect_trees(tiles.select(
        "image_id", "bytes", "w", "h", "fmt")).select(
        "image_id", "x", "y", "h").collect()))
    assert det_a == det_b


def test_resolution_mismatch_rejected(spark, tmp_path):
    """A self-aligned 1.0 m raster must NOT load into the 0.5 m engine
    grid — that would silently halve every world coordinate."""
    arr = np.zeros((64, 64), np.float32)
    p = tmp_path / "res1.tif"
    p.write_bytes(encode_geotiff(arr, x0=64.0, y1=128.0, res=1.0))
    with pytest.raises(Exception, match="engine resolution"):
        read_geotiff_tiles(spark, str(tmp_path)).collect()


def test_nodata_pixels_become_nan(spark, tmp_path):
    arr = np.full((64, 64), 5.0, np.float32)
    arr[0, 0] = -9999.0
    p = tmp_path / "nd.tif"
    p.write_bytes(encode_geotiff(arr, x0=0.0, y1=32.0, res=0.5,
                                 nodata=-9999.0))
    from lidartree_spark.codecs import decode_tile
    row = read_geotiff_tiles(spark, str(tmp_path)).collect()[0]
    a = decode_tile(row["bytes"], row["fmt"], row["w"], row["h"])
    assert np.isnan(a[0, 0]) and a[1, 1] == 5.0
    assert np.isnan(a).sum() == 1


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:
    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.integers(1, 80),
           st.integers(1, 80), st.sampled_from(["f4", "u2", "u1"]))
    def test_codec_roundtrip_property(seed, h, w, kind):
        """ANY array shape/dtype/content (incl. NaN, inf, subnormals
        for f32; full range for uints) survives the codec bit-exactly
        with its georef."""
        rng = np.random.default_rng(seed)
        if kind == "f4":
            arr = rng.normal(0, 1e3, (h, w)).astype(np.float32)
            arr[rng.random((h, w)) < 0.05] = np.nan
            arr[rng.random((h, w)) < 0.02] = np.inf
        elif kind == "u2":
            arr = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        else:
            arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
        x0 = float(rng.integers(-10**6, 10**6)) / 4
        y1 = float(rng.integers(-10**6, 10**6)) / 4
        res = float(rng.choice([0.25, 0.5, 1.0, 2.0]))
        cap = f"tile {seed}"
        back, geo = decode_geotiff(
            encode_geotiff(arr, x0, y1, res, caption=cap))
        assert np.array_equal(back, arr, equal_nan=True)
        assert (geo["x0"], geo["y1"]) == (x0, y1)
        assert geo["res_x"] == res and geo["caption"] == cap


def test_off_grid_raster_rejected(spark, tmp_path):
    arr = np.zeros((64, 64), np.float32)
    p = tmp_path / "off.tif"
    p.write_bytes(encode_geotiff(arr, x0=17.3, y1=32.0, res=0.5))
    with pytest.raises(Exception, match="not aligned"):
        read_geotiff_tiles(spark, str(tmp_path)).collect()
