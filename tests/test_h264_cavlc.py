"""CAVLC Intra_16x16 H.264 subset: VLC table structure, the published
worked example, residual-engine inversion, transform exactness, the
rate-distortion ladder, MP4 wiring, and the honest-failure paths."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lidartree_spark import h264_cavlc as cv
from lidartree_spark.h264 import (
    BitReader,
    BitWriter,
    decode_h264_ipcm,
    encode_h264_cavlc,
    encode_pps,
    parse_pps,
)


# --------------------------------------------------------------------------
# table structure

def test_vlc_tables_prefix_free_and_single_leaf_deficit():
    """Every VLC table must be prefix-free; and every table's Kraft sum is
    either exactly 1 or short of 1 by exactly ONE leaf (the spec's
    avoid-the-all-zeros-codeword design). A random transcription error
    almost surely breaks one of these."""
    from fractions import Fraction
    for name, tab in cv.all_vlc_tables().items():
        codes = list(tab.values()) if isinstance(tab, dict) else list(tab)
        assert len(set(codes)) == len(codes), name
        for i, a in enumerate(codes):
            for j, b in enumerate(codes):
                assert i == j or not b.startswith(a), \
                    f"{name}: '{a}' prefixes '{b}'"
        deficit = 1 - sum(Fraction(1, 2 ** len(c)) for c in codes)
        assert deficit >= 0, name
        assert deficit == 0 or deficit.numerator == 1, \
            f"{name}: deficit {deficit} is not a single unused leaf"


def test_published_cavlc_worked_example():
    """The standard worked example (appears in the published CAVLC
    literature): zig-zag block [0,3,0,1,-1,-1,0,1,0...] at nC=0 encodes to
    exactly '000010001110010111101101'."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0]
    bw = BitWriter()
    cv.encode_residual(bw, coeffs, 0, 16)
    bits = "".join(format(b, "08b") for b in bw._bytes)
    if bw._nbits:
        bits += format(bw._acc, f"0{bw._nbits}b")
    assert bits == "000010001110010111101101"
    bw.rbsp_trailing()
    got, tc = cv.decode_residual(BitReader(bw.rbsp()), 0, 16)
    assert got == coeffs and tc == 5


# --------------------------------------------------------------------------
# residual engine inversion

@given(st.data())
@settings(max_examples=400, deadline=None)
def test_residual_roundtrip(data):
    maxn = data.draw(st.sampled_from([16, 15, 4]))
    nc = -1 if maxn == 4 else data.draw(
        st.sampled_from([0, 1, 2, 3, 4, 5, 7, 8, 16]))
    n_nz = data.draw(st.integers(min_value=0, max_value=maxn))
    idxs = data.draw(st.permutations(range(maxn)))[:n_nz]
    coeffs = [0] * maxn
    for i in idxs:
        coeffs[i] = data.draw(st.integers(min_value=1, max_value=200000)) \
            * data.draw(st.sampled_from([1, -1]))
    bw = BitWriter()
    tc_enc = cv.encode_residual(bw, coeffs, nc, maxn)
    bw.rbsp_trailing()
    got, tc_dec = cv.decode_residual(BitReader(bw.rbsp()), nc, maxn)
    assert got == coeffs and tc_enc == tc_dec == n_nz


def test_level_code_escape_boundaries():
    """The level_prefix >= 15 escapes (§9.2.2.1) at their exact seams."""
    for sl in range(0, 7):
        floor = 30 if sl == 0 else (15 << sl)
        for lc in [0, 1, 13, 14, 29, floor - 1, floor, floor + 4095,
                   floor + 4096, floor + 4096 + 8191, floor + 4096 + 8192]:
            if lc < 0:
                continue
            bw = BitWriter()
            cv._encode_level_code(bw, lc, sl)
            bw.rbsp_trailing()
            br = BitReader(bw.rbsp())
            prefix = 0
            while br.u(1) == 0:
                prefix += 1
            if prefix == 14 and sl == 0:
                size = 4
            elif prefix >= 15:
                size = prefix - 3
            else:
                size = sl
            suffix = br.u(size) if size else 0
            got = (min(15, prefix) << sl) + suffix
            if prefix >= 15 and sl == 0:
                got += 15
            if prefix >= 16:
                got += (1 << (prefix - 3)) - 4096
            assert got == lc, (sl, lc, prefix, suffix)


# --------------------------------------------------------------------------
# transform exactness

def test_transform_quant_roundtrip_tight_at_qp0():
    """QP 0 is near-lossless, not lossless: MF*V = 131070 ~= 2^17 (off by
    2/131072 on two position classes), so full-range +-255 residuals can
    reconstruct off by 1. Bound it at 1 LSB."""
    rng = np.random.default_rng(0)
    worst = 0
    for _ in range(200):
        res = rng.integers(-255, 256, (4, 4)).astype(np.int64)
        w = cv.forward4x4(res)
        rec = cv.inverse4x4(cv.dequant4x4_ac(cv.quant4x4(w, 0), 0))
        worst = max(worst, int(np.abs(rec - res).max()))
    assert worst <= 1


def test_dc_path_matches_ac_scale():
    """luma_dc_forward/inverse must land the DC at 4x the forward-transform
    scale — the same scale dequantized AC coefficients carry into the
    inverse transform (the bug class this pins produced a flat ~20 dB
    ceiling)."""
    rng = np.random.default_rng(1)
    dc = rng.integers(-4000, 4000, (4, 4)).astype(np.int64)
    rec = cv.luma_dc_inverse(cv.luma_dc_forward(dc, 0), 0)
    assert np.abs(rec - 4 * dc).max() <= 4
    # and a mid/high qp keeps relative error bounded
    for qp in (20, 40, 51):
        rec = cv.luma_dc_inverse(cv.luma_dc_forward(dc, qp), qp)
        step = float(cv._V[qp % 6][0] * (1 << qp // 6)) / 4.0
        assert np.abs(rec - 4 * dc).max() <= 4 * step


# --------------------------------------------------------------------------
# end-to-end codec

def _tiles(n=3, h=48, w=64, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (40 + 0.8 * xx + 0.5 * yy
           + 60 * np.exp(-((xx - 30) ** 2 + (yy - 20) ** 2) / 60.0)
           + rng.normal(0, 3, (h, w)))
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([np.roll(img, 5 * i, axis=1) for i in range(n)])


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def test_cavlc_rate_distortion_ladder():
    frames = _tiles()
    prev_bits = None
    for qp, min_psnr in ((0, 60.0), (10, 48.0), (18, 40.0), (30, 30.0)):
        sps, pps, slices = encode_h264_cavlc(frames, qp=qp)
        dec = decode_h264_ipcm(sps, pps, slices)
        assert dec.shape == frames.shape
        assert _psnr(dec, frames) >= min_psnr, qp
        bits = sum(len(s) for s in slices)
        if prev_bits is not None:
            assert bits < prev_bits  # higher qp -> fewer bits
        prev_bits = bits


def test_cavlc_qp0_near_lossless():
    frames = _tiles(n=2)
    sps, pps, slices = encode_h264_cavlc(frames, qp=0)
    dec = decode_h264_ipcm(sps, pps, slices)
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 2


def test_cavlc_random_noise_roundtrip():
    """Worst-case content (uniform noise) still decodes to what the
    encoder reconstructed — exercises dense coefficients, high nC
    contexts, and the FLC coeff_token path."""
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (2, 32, 32), dtype=np.uint8)
    sps, pps, slices = encode_h264_cavlc(frames, qp=8)
    dec = decode_h264_ipcm(sps, pps, slices)
    assert _psnr(dec, frames) >= 40.0


def test_cavlc_cropped_dimensions():
    frames = _tiles(n=2, h=30, w=50)
    sps, pps, slices = encode_h264_cavlc(frames, qp=6)
    dec = decode_h264_ipcm(sps, pps, slices)
    assert dec.shape == frames.shape
    assert _psnr(dec, frames) >= 45.0


def test_flat_frame_codes_compactly():
    """A flat frame must code every MB with cbp_luma=0 (mb_type < 13) —
    a handful of bits per MB, far below a bit per pixel."""
    frames = np.full((1, 64, 64), 77, np.uint8)
    sps, pps, slices = encode_h264_cavlc(frames, qp=10)
    dec = decode_h264_ipcm(sps, pps, slices)
    assert np.abs(dec.astype(int) - 77).max() <= 1
    assert len(slices[0]) * 8 < 64 * 64 / 8


def test_mp4_cavlc_track_roundtrip():
    from lidartree_spark.mp4 import decode_mp4, encode_mp4_h264
    frames = _tiles(n=2)
    buf = encode_mp4_h264(frames, qp=12)
    dec = decode_mp4(buf)
    assert dec.shape == frames.shape
    assert _psnr(dec, frames) >= 40.0
    # default stays the lossless I_PCM path
    exact = decode_mp4(encode_mp4_h264(frames))
    assert np.abs(exact.astype(int)
                  - np.maximum(frames, 1).astype(int)).max() == 0


# --------------------------------------------------------------------------
# honest failure paths

def test_entropy_slice_with_deblocking_enabled_raises():
    """A CAVLC slice that leaves the §8.7 loop filter enabled cannot be
    decoded exactly without implementing it — must raise, not return
    silently-unfiltered pixels."""
    sps_rbsp_w, sps_rbsp_h = 32, 32
    from lidartree_spark.h264 import encode_sps, parse_sps
    sps = parse_sps(encode_sps(sps_rbsp_w, sps_rbsp_h))
    pps = parse_pps(encode_pps(deblock_control=True))
    bw = BitWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(7)            # slice_type I
    bw.ue(0)            # pps id
    bw.u(4, 0)          # frame_num
    bw.ue(0)            # idr_pic_id
    bw.u(1, 0)
    bw.u(1, 0)
    bw.se(0)            # slice_qp_delta
    bw.ue(0)            # disable_deblocking_filter_idc = 0 (ENABLED)
    bw.se(0)            # slice_alpha_c0_offset_div2
    bw.se(0)            # slice_beta_offset_div2
    bw.ue(3)            # mb_type I_16x16_2_0_0
    bw.rbsp_trailing()
    from lidartree_spark.h264 import decode_slice_i
    with pytest.raises(NotImplementedError, match="deblocking"):
        decode_slice_i(bw.rbsp(), sps, pps)


def test_i_nxn_deblock_enabled_raises():
    """I_NxN decodes now (tests/test_h264_i4x4.py), but an entropy-coded
    slice that leaves the loop filter enabled still refuses exactly."""
    from lidartree_spark.h264 import decode_slice_i, encode_sps, parse_sps
    sps = parse_sps(encode_sps(16, 16))
    pps = parse_pps(encode_pps())
    bw = BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(4, 0)
    bw.ue(0)
    bw.u(1, 0)
    bw.u(1, 0)
    bw.se(0)
    bw.ue(0)            # mb_type 0: I_NxN
    bw.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="deblocking"):
        decode_slice_i(bw.rbsp(), sps, pps)
