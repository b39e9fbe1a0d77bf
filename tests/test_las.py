"""LAS 1.2 codec + distributed reader (lidartree_spark.las).

Reference semantics: /root/reference/R/common.R:16-20 (lidR::readLAS of the
bundled .laz tile); this file covers the UNCOMPRESSED container per the
public ASPRS LAS 1.2 spec — the .laz decompression path is covered by
tests/test_laz.py. Oracle parity for the end-to-end ingest ->
DSM chain is in tests/test_extended_oracles.py (las_ingest_dsm)."""

import numpy as np
import pandas as pd
import pytest

from lidartree_spark.las import (
    HEADER_SIZE,
    decode_las_header,
    decode_las_points,
    encode_las,
    read_las,
)


def _sample(n=100, fmt=1):
    g = np.arange(n, dtype=np.int64)
    return dict(x=g * 0.25, y=(g * 3 % 50) * 0.25, z=(g % 7) * 0.125,
                classification=np.where(g % 4 == 0, 2, 1),
                intensity=(g * 11) % 2048, gps_time=g * 0.5,
                return_number=1 + (g % 3),
                scale=(0.25, 0.25, 0.125), point_format=fmt)


def test_header_roundtrip():
    buf = encode_las(**_sample())
    hdr = decode_las_header(buf)
    assert hdr["point_format"] == 1
    assert hdr["n_records"] == 100
    assert hdr["rec_len"] == 28
    assert hdr["offset_to_points"] == HEADER_SIZE
    assert (hdr["scale_x"], hdr["scale_z"]) == (0.25, 0.125)


@pytest.mark.parametrize("fmt,reclen", [(0, 20), (1, 28), (2, 26), (3, 34)])
def test_point_formats_roundtrip(fmt, reclen):
    s = _sample(fmt=fmt)
    if fmt in (0, 2):
        s.pop("gps_time")
    buf = encode_las(**s)
    hdr = decode_las_header(buf)
    assert hdr["rec_len"] == reclen
    pts = decode_las_points(buf)
    g = np.arange(100)
    # power-of-two scale: decoded doubles are EXACT
    assert np.array_equal(pts["x"].to_numpy(), g * 0.25)
    assert np.array_equal(pts["z"].to_numpy(), (g % 7) * 0.125)
    assert np.array_equal(pts["classification"].to_numpy(),
                          np.where(g % 4 == 0, 2, 1))
    assert np.array_equal(pts["intensity"].to_numpy(), (g * 11) % 2048)
    assert np.array_equal(pts["return_number"].to_numpy(), 1 + (g % 3))
    assert np.array_equal(pts["n_returns"].to_numpy(), 1 + (g % 3))
    if fmt in (1, 3):
        assert np.array_equal(pts["gps_time"].to_numpy(), g * 0.5)
    else:
        assert pts["gps_time"].isna().all()


def test_slice_decode_matches_full():
    buf = encode_las(**_sample())
    full = decode_las_points(buf)
    part = decode_las_points(buf, start=37, count=25)
    pd.testing.assert_frame_equal(
        part.reset_index(drop=True),
        full.iloc[37:62].reset_index(drop=True))
    # over-running count clamps
    tail = decode_las_points(buf, start=90, count=1000)
    assert len(tail) == 10


def test_extra_record_bytes_stride():
    """rec_len larger than the format minimum (extra bytes are legal per
    spec): the padded-dtype stride path must skip them."""
    buf = bytearray(encode_las(**_sample(n=10)))
    hdr = decode_las_header(bytes(buf))
    import struct
    # rewrite as 30-byte records with 2 trailing pad bytes each
    old = bytes(buf[HEADER_SIZE:])
    recs = [old[i * 28:(i + 1) * 28] + b"\xAB\xCD" for i in range(10)]
    struct.pack_into("<H", buf, 105, 30)
    new = bytes(buf[:HEADER_SIZE]) + b"".join(recs)
    pts = decode_las_points(new)
    ref = decode_las_points(encode_las(**_sample(n=10)))
    pd.testing.assert_frame_equal(pts, ref)


def test_guards_fail_loudly():
    buf = bytearray(encode_las(**_sample(n=5)))
    with pytest.raises(ValueError, match="LASF"):
        decode_las_header(b"NOPE" + bytes(buf[4:]))
    laz = bytearray(buf)
    laz[104] = 0x80 | 1  # LAZ compression bit
    with pytest.raises(NotImplementedError, match="LAZ"):
        decode_las_header(bytes(laz))
    v14 = bytearray(buf)
    v14[25] = 4
    with pytest.raises(NotImplementedError, match="1.4"):
        decode_las_header(bytes(v14))
    f9 = bytearray(buf)
    f9[104] = 9
    with pytest.raises(NotImplementedError, match="format 9"):
        decode_las_header(bytes(f9))


def test_distributed_read_matches_local(spark, tmp_path):
    """Multi-file, multi-chunk distributed read == concatenated local
    decode (chunk_records far below file size exercises the range math)."""
    bufs = {}
    for f in range(3):
        g = np.arange(f * 1000, (f + 1) * 1000, dtype=np.int64)
        buf = encode_las(x=g * 0.25, y=(g % 61) * 0.25, z=(g % 13) * 0.125,
                         classification=np.where(g % 2 == 0, 2, 1),
                         intensity=g % 1024, gps_time=g * 0.5,
                         return_number=1 + (g % 2),
                         scale=(0.25, 0.25, 0.125))
        p = tmp_path / f"f{f}.las"
        p.write_bytes(buf)
        bufs[str(p)] = buf
    got = (read_las(spark, str(tmp_path), chunk_records=256)
           .toPandas()
           .sort_values(["path", "gps_time"])
           .reset_index(drop=True))
    want = pd.concat(
        [decode_las_points(b).assign(path=p)
         for p, b in sorted(bufs.items())],
        ignore_index=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values(["path", "gps_time"]).reset_index(drop=True))


def test_read_las_missing(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_las(spark, str(tmp_path / "nope"))


def test_write_las_distributed_roundtrip(spark, tmp_path):
    """write_las (one file per partition, atomic rename) -> read_las
    recovers every row; empty partitions produce no file."""
    import pyspark.sql.functions as F
    d = str(tmp_path / "sink")
    from lidartree_spark.las import write_las
    pts = spark.range(5000).selectExpr(
        "CAST(id % 200 AS DOUBLE) * 0.25 AS x",
        "CAST((id * 3) % 160 AS DOUBLE) * 0.25 AS y",
        "CAST(id % 97 AS DOUBLE) * 0.125 AS z",
        "CAST(CASE WHEN id % 4 = 0 THEN 2 ELSE 1 END AS INT) "
        "AS classification",
        "CAST(id AS DOUBLE) * 0.5 AS gps_time",
    ).repartition(12)  # includes the chance of an empty partition
    manifest = write_las(pts, d, scale=(0.25, 0.25, 0.125)).collect()
    assert sum(r["n_records"] for r in manifest) == 5000
    assert all(r["path"].endswith(".las") for r in manifest)
    back = read_las(spark, d, chunk_records=1024)
    assert back.count() == 5000
    agg = back.agg(
        F.sum("z").alias("sz"),
        F.sum(F.when(F.col("classification") == 2, 1).otherwise(0))
         .alias("ng"),
        F.max("gps_time").alias("tg")).collect()[0]
    g = np.arange(5000)
    assert agg["sz"] == float(((g % 97) * 0.125).sum())
    assert agg["ng"] == int((g % 4 == 0).sum())
    assert agg["tg"] == 4999 * 0.5


def test_encode_overflow_and_truncated_header_guards():
    """Coordinates that overflow int32 after scaling raise (never wrap);
    a truncated header raises a clean ValueError naming the size."""
    g = np.arange(3)
    with pytest.raises(ValueError, match="overflow int32"):
        encode_las(x=np.array([5e6, 0.0, 1.0]), y=g * 1.0, z=g * 1.0,
                   scale=(0.001, 0.001, 0.001))
    # same coords fit fine with a bracketing offset
    buf = encode_las(x=np.array([5e6, 5e6 + 1, 5e6 + 2]), y=g * 1.0,
                     z=g * 1.0, scale=(0.001, 0.001, 0.001),
                     offset=(5e6, 0.0, 0.0))
    assert np.array_equal(decode_las_points(buf)["x"].to_numpy(),
                          np.array([5e6, 5e6 + 1, 5e6 + 2]))
    with pytest.raises(ValueError, match="truncated LAS header"):
        decode_las_header(buf[:100])


def test_encode_attribute_range_guards():
    """Out-of-range attributes raise instead of wrapping (return 9 would
    silently encode as 1, intensity 70000 as 4464)."""
    g = np.arange(3)
    base = dict(x=g * 0.25, y=g * 0.25, z=g * 0.125,
                scale=(0.25, 0.25, 0.125))
    with pytest.raises(ValueError, match="return_number out of LAS range"):
        encode_las(**base, return_number=np.array([1, 2, 9]))
    with pytest.raises(ValueError, match="intensity out of LAS range"):
        encode_las(**base, intensity=np.array([0, 70000, 1]))
    with pytest.raises(ValueError, match="classification out of LAS range"):
        encode_las(**base, classification=np.array([0, 300, 1]))
