"""Tile pixel codecs.

The input table (BASELINE.json ``input_hint``) is
``tiles(image_id, bytes, w, h, fmt, caption, phash)``. ``bytes`` holds the
encoded pixel payload of one georeferenced raster tile (a canopy height model
patch, float values, NaN = no-data). Three formats are supported — all
decodable without PIL/cv2 (not available in this environment):

- ``raw_f32``  : row-major little-endian float32, lossless (NaN preserved).
- ``png16``    : zlib-compressed 16-bit fixed-point with a small header,
                 lossless for values on a 1/256 grid (our generator grid);
                 NaN encoded as sentinel 0xFFFF.
- ``q8``       : lossy 8-bit linear quantization of [lo, hi] — exercises the
                 PSNR >= 40 dB acceptance path of the input contract.

Replaces the reference's terra/lidR file readers
(/root/reference/R/common.R:16-20, tree_detection.R:1165-1173).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"LTRS"


def encode_tile(arr: np.ndarray, fmt: str) -> bytes:
    """Encode a 2D float array (h, w) into the tile payload for `fmt`."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim != 2:
        raise ValueError("tile array must be 2D (h, w)")
    h, w = a.shape
    if fmt == "raw_f32":
        return a.tobytes(order="C")
    if fmt == "png16":
        # fixed-point 1/256 units, NaN -> 0xFFFF sentinel; zlib-compressed.
        q = np.round(np.nan_to_num(a, nan=0.0) * 256.0)
        q = np.clip(q, 0, 0xFFFE).astype(np.uint16)
        q[np.isnan(a)] = 0xFFFF
        payload = zlib.compress(q.tobytes(order="C"), level=6)
        return _MAGIC + struct.pack("<HH", h, w) + payload
    if fmt == "q8":
        # lossy: linear 8-bit quantization of the tile's [lo, hi] range.
        finite = a[np.isfinite(a)]
        lo = float(finite.min()) if finite.size else 0.0
        hi = float(finite.max()) if finite.size else 1.0
        if hi <= lo:
            hi = lo + 1.0
        q = np.round((np.nan_to_num(a, nan=lo) - lo) / (hi - lo) * 254.0)
        q = np.clip(q, 0, 254).astype(np.uint8)
        q[np.isnan(a)] = 255  # NaN sentinel
        payload = zlib.compress(q.tobytes(order="C"), level=6)
        return _MAGIC + struct.pack("<HHff", h, w, lo, hi) + payload
    raise ValueError(f"unknown tile format: {fmt!r}")


def decode_tile(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode a tile payload back to a float32 array of shape (h, w)."""
    if fmt == "raw_f32":
        return np.frombuffer(buf, dtype=np.float32).reshape(h, w).copy()
    if fmt == "png16":
        if buf[:4] != _MAGIC:
            raise ValueError("bad png16 header")
        hh, ww = struct.unpack_from("<HH", buf, 4)
        q = np.frombuffer(zlib.decompress(buf[8:]), dtype=np.uint16).reshape(hh, ww)
        out = q.astype(np.float32) / 256.0
        out[q == 0xFFFF] = np.nan
        return out
    if fmt == "q8":
        if buf[:4] != _MAGIC:
            raise ValueError("bad q8 header")
        hh, ww, lo, hi = struct.unpack_from("<HHff", buf, 4)
        q = np.frombuffer(zlib.decompress(buf[16:]), dtype=np.uint8).reshape(hh, ww)
        out = (q.astype(np.float32) / 254.0) * (hi - lo) + lo
        out[q == 255] = np.nan
        return out
    raise ValueError(f"unknown tile format: {fmt!r}")


def psnr(ref: np.ndarray, test: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB over finite pixels (inf if identical)."""
    m = np.isfinite(ref) & np.isfinite(test)
    if not m.any():
        return float("inf")
    err = ref[m].astype(np.float64) - test[m].astype(np.float64)
    mse = float(np.mean(err * err))
    if mse == 0.0:
        return float("inf")
    peak = float(np.max(np.abs(ref[m]))) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 block-mean image thresholded at its median.

    Deterministic, pure numpy (no DCT libs needed); stable across the lossless
    codecs and robust to q8 quantization noise.
    """
    a = np.nan_to_num(np.asarray(arr, dtype=np.float64), nan=0.0)
    h, w = a.shape
    # average-pool to 8x8 by splitting into near-equal blocks
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    means = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blk = a[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)]
            means[i, j] = blk.mean() if blk.size else 0.0
    med = np.median(means)
    bits = (means > med).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # to signed int64 range
    if v >= 1 << 63:
        v -= 1 << 64
    return int(v)
