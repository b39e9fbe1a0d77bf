"""Pure-python H.264 / AVC (ITU-T Rec. H.264 | ISO/IEC 14496-10) —
Baseline-profile all-intra encoder and decoder, three macroblock subsets:

1. I_PCM (mb_type 25, §7.4.5 / Table 7-11): raw byte-aligned samples in a
   real NAL/slice syntax. LOSSLESS (up to the §7.4.5 constraint that 8-bit
   PCM samples shall not equal 0 in profile 66 — the encoder clamps 0 -> 1,
   at most 1 LSB of error on black pixels).
2. CAVLC Intra_16x16 (mb_types 1-24): REAL entropy-coded video — §8.3.3
   intra prediction (V/H/DC/Plane on reconstructed neighbors), §8.5 integer
   core transform + luma DC Hadamard + quantization, §9.2 CAVLC residual
   coding (coeff_token / levels / total_zeros / run_before — tables and
   engine in h264_cavlc.py, with its validation story stated there). Rate
   and distortion follow qp: qp=0 is near-lossless (~66 dB), qp<=18 clears
   the 40 dB PSNR bar on the engine's tile imagery. Encoded streams
   explicitly disable the §8.7 deblocking filter (PPS
   deblocking_filter_control_present_flag=1 + slice idc=1), so they decode
   EXACTLY on any conformant decoder and on this one.
3. CAVLC I_NxN (mb_type 0): per-4x4 intra prediction with ALL NINE
   §8.3.1.2 modes (V/H/DC/DDL/DDR/VR/HD/VL/HU on reconstructed
   neighbors, top-right sample substitution, §8.3.1.1 most-probable-mode
   coding), Table 9-4 me(v) coded_block_pattern, per-block CAVLC
   residuals under the §9.2.1 nC neighbor contexts.

The decoder parses the genuine syntax — NAL headers, EBSP emulation
prevention (§7.3.1, 0x000003 escaping), Exp-Golomb SPS/PPS/slice headers —
and raises a specific NotImplementedError the moment it meets what it
cannot decode exactly: CABAC entropy coding, inter slices, interlace, or
an entropy-coded slice that leaves the deblocking filter enabled. Third-party streams fail loudly and
precisely rather than mis-decoding.

Frames are grayscale (the engine's canopy tiles): luma carries the image,
chroma is flat 128 (4:2:0 — the only chroma format Baseline supports;
chroma_format_idc is not even present in a profile-66 SPS, §7.3.2.1.1).
Odd widths/heights cannot be expressed by 4:2:0 frame cropping (crop units
are SubWidthC=SubHeightC=2 luma samples, §7.4.2.1.1), so the encoder
requires even dimensions.

No reference-repo counterpart (cran/lidaRtRee has no video handling); this
exists for the multimodal column family only. Everything here derives from
the public ITU-T H.264 spec; section numbers cited inline.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# bit I/O + Exp-Golomb (§9.1)

class BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def u(self, n: int, val: int) -> None:
        if val < 0 or val >> n:
            raise ValueError(f"u({n}) out of range: {val}")
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((val >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self._bytes.append(self._acc)
                self._acc = 0
                self._nbits = 0

    def ue(self, val: int) -> None:
        code = val + 1
        nbits = code.bit_length()
        self.u(2 * nbits - 1, code)

    def se(self, val: int) -> None:
        # §9.1.1: codeNum = 2|v| - (v > 0)
        self.ue(2 * abs(val) - (1 if val > 0 else 0))

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit / rbsp_alignment_zero_bit padding."""
        while self._nbits:
            self.u(1, 0)

    def bytes_aligned(self, data: bytes) -> None:
        if self._nbits:
            raise ValueError("not byte aligned")
        self._bytes += data

    def rbsp_trailing(self) -> None:
        self.u(1, 1)  # rbsp_stop_one_bit
        self.align_zero()

    def rbsp(self) -> bytes:
        if self._nbits:
            raise ValueError("unterminated RBSP (call rbsp_trailing)")
        return bytes(self._bytes)


class BitReader:
    def __init__(self, buf: bytes) -> None:
        self._buf = buf
        self._pos = 0  # bit position

    def u(self, n: int) -> int:
        val = 0
        for _ in range(n):
            byte = self._buf[self._pos >> 3]
            val = (val << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return val

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        self._pos = (self._pos + 7) & ~7

    def bytes_aligned(self, n: int) -> bytes:
        if self._pos & 7:
            raise ValueError("not byte aligned")
        start = self._pos >> 3
        self._pos += 8 * n
        return self._buf[start:start + n]

    def bits_left(self) -> int:
        return 8 * len(self._buf) - self._pos

    def more_rbsp_data(self) -> bool:
        """§7.2: data remains before the rbsp_stop_one_bit."""
        left = self.bits_left()
        if left <= 0:
            return False
        # find the last 1 bit in the buffer (the stop bit)
        save = self._pos
        for pos in range(8 * len(self._buf) - 1, save - 1, -1):
            byte = self._buf[pos >> 3]
            if (byte >> (7 - (pos & 7))) & 1:
                return pos > save
        return False


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte (§7.3.1 / §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Strip emulation_prevention_three_byte."""
    out = bytearray()
    zeros = 0
    i, n = 0, len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < n and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def nal(nal_unit_type: int, rbsp: bytes, nal_ref_idc: int = 3) -> bytes:
    """NAL unit: 1-byte header (forbidden 0, §7.3.1) + escaped payload."""
    return bytes([(nal_ref_idc << 5) | nal_unit_type]) + rbsp_to_ebsp(rbsp)


# --------------------------------------------------------------------------
# encoder

LOG2_MAX_FRAME_NUM = 4  # log2_max_frame_num_minus4 = 0; all-IDR so frame_num=0


def encode_sps(w: int, h: int) -> bytes:
    """Seq parameter set RBSP (§7.3.2.1.1), Baseline (profile_idc 66)."""
    if w % 2 or h % 2:
        raise ValueError("H.264 4:2:0 frame cropping needs even dimensions")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    bw = BitWriter()
    bw.u(8, 66)           # profile_idc: Baseline
    bw.u(8, 0xC0)         # constraint_set0/1 = 1, rest 0
    bw.u(8, 30)           # level_idc 3.0
    bw.ue(0)              # seq_parameter_set_id
    bw.ue(LOG2_MAX_FRAME_NUM - 4)
    bw.ue(2)              # pic_order_cnt_type 2: POC from decoding order
    bw.ue(0)              # max_num_ref_frames (all-IDR stream)
    bw.u(1, 0)            # gaps_in_frame_num_value_allowed_flag
    bw.ue(mb_w - 1)       # pic_width_in_mbs_minus1
    bw.ue(mb_h - 1)       # pic_height_in_map_units_minus1
    bw.u(1, 1)            # frame_mbs_only_flag
    bw.u(1, 1)            # direct_8x8_inference_flag
    crop_r, crop_b = (16 * mb_w - w) // 2, (16 * mb_h - h) // 2
    if crop_r or crop_b:
        bw.u(1, 1)        # frame_cropping_flag
        bw.ue(0)
        bw.ue(crop_r)     # units of SubWidthC=2 luma samples (§7.4.2.1.1)
        bw.ue(0)
        bw.ue(crop_b)
    else:
        bw.u(1, 0)
    bw.u(1, 0)            # vui_parameters_present_flag
    bw.rbsp_trailing()
    return bw.rbsp()


def encode_pps(deblock_control: bool = False) -> bytes:
    """Pic parameter set RBSP (§7.3.2.2): CAVLC, no slice groups.

    deblock_control=True lets slice headers carry
    disable_deblocking_filter_idc — the CAVLC encoder disables the loop
    filter there so its streams decode exactly without §8.7."""
    bw = BitWriter()
    bw.ue(0)              # pic_parameter_set_id
    bw.ue(0)              # seq_parameter_set_id
    bw.u(1, 0)            # entropy_coding_mode_flag: CAVLC
    bw.u(1, 0)            # bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)              # num_slice_groups_minus1
    bw.ue(0)              # num_ref_idx_l0_default_active_minus1
    bw.ue(0)              # num_ref_idx_l1_default_active_minus1
    bw.u(1, 0)            # weighted_pred_flag
    bw.u(2, 0)            # weighted_bipred_idc
    bw.se(0)              # pic_init_qp_minus26
    bw.se(0)              # pic_init_qs_minus26
    bw.se(0)              # chroma_qp_index_offset
    bw.u(1, 1 if deblock_control else 0)
    #                       deblocking_filter_control_present_flag
    bw.u(1, 0)            # constrained_intra_pred_flag
    bw.u(1, 0)            # redundant_pic_cnt_present_flag
    bw.rbsp_trailing()
    return bw.rbsp()


def _pad_mb(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    mb_h, mb_w = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    return np.pad(img, ((0, mb_h - h), (0, mb_w - w)), mode="edge")


def encode_idr_ipcm(img: np.ndarray, idr_pic_id: int) -> bytes:
    """One IDR coded-slice RBSP where every MB is I_PCM (§7.3.4/§7.3.5)."""
    padded = _pad_mb(img)
    # §7.4.5: 8-bit PCM sample values shall not equal 0 in profile 66
    luma = np.maximum(padded, 1).astype(np.uint8)
    mb_h, mb_w = padded.shape[0] // 16, padded.shape[1] // 16
    chroma = bytes([128] * 128)  # Cb 8x8 + Cr 8x8, flat gray

    bw = BitWriter()
    # slice_header (§7.3.3)
    bw.ue(0)                       # first_mb_in_slice
    bw.ue(7)                       # slice_type 7: I (all slices in pic are I)
    bw.ue(0)                       # pic_parameter_set_id
    bw.u(LOG2_MAX_FRAME_NUM, 0)    # frame_num (IDR resets to 0)
    bw.ue(idr_pic_id & 0xFFFF)     # idr_pic_id
    # pic_order_cnt_type 2: no POC syntax
    # dec_ref_pic_marking for IDR (§7.3.3.3):
    bw.u(1, 0)                     # no_output_of_prior_pics_flag
    bw.u(1, 0)                     # long_term_reference_flag
    bw.se(0)                       # slice_qp_delta
    # slice_data (§7.3.4) — I slice: no mb_skip_run, one macroblock_layer per MB
    for my in range(mb_h):
        for mx in range(mb_w):
            bw.ue(25)              # mb_type I_PCM (Table 7-11)
            bw.align_zero()        # pcm_alignment_zero_bit
            block = luma[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
            bw.bytes_aligned(block.tobytes())  # 256 pcm_sample_luma
            bw.bytes_aligned(chroma)           # 128 pcm_sample_chroma
    bw.rbsp_trailing()
    return bw.rbsp()


def encode_h264_ipcm(frames: np.ndarray) -> tuple[bytes, bytes, list[bytes]]:
    """(n, h, w) uint8/float frames -> (sps_nal, pps_nal, [slice_nal]).

    NALs are EBSP-escaped and header-prefixed, ready for avcC + length-
    prefixed MP4 samples or for Annex-B start-code concatenation.
    """
    f = np.asarray(frames)
    if f.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    if f.dtype != np.uint8:
        f = np.clip(np.round(f.astype(np.float64) * 255.0), 0, 255) \
            .astype(np.uint8)
    n, h, w = f.shape
    sps = nal(7, encode_sps(w, h))
    pps = nal(8, encode_pps())
    slices = [nal(5, encode_idr_ipcm(f[i], i)) for i in range(n)]
    return sps, pps, slices


# --------------------------------------------------------------------------
# CAVLC I_16x16 coding (entropy layer + transform in h264_cavlc.py)
#
# Intra_16x16 prediction (§8.3.3): mode 0 Vertical, 1 Horizontal, 2 DC,
# 3 Plane. Prediction always runs on RECONSTRUCTED neighbor pixels, so the
# encoder reconstructs each MB exactly as the decoder will.

def _intra16_pred(mode: int, top: np.ndarray | None,
                  left: np.ndarray | None) -> np.ndarray | None:
    """16x16 int64 prediction, or None if the mode's neighbors are absent."""
    if mode == 0:                       # Vertical
        if top is None:
            return None
        return np.tile(top.astype(np.int64), (16, 1))
    if mode == 1:                       # Horizontal
        if left is None:
            return None
        return np.tile(left.astype(np.int64)[:, None], (1, 16))
    if mode == 2:                       # DC
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, np.int64)
    # Plane (§8.3.3.4)
    if top is None or left is None:
        return None
    t = top.astype(np.int64)
    le = left.astype(np.int64)
    hh = sum((x + 1) * (int(t[8 + x]) - int(t[6 - x])) for x in range(8))
    vv = sum((y + 1) * (int(le[8 + y]) - int(le[6 - y])) for y in range(8))
    a = 16 * (int(le[15]) + int(t[15]))
    b = (5 * hh + 32) >> 6
    c = (5 * vv + 32) >> 6
    xs = np.arange(16, dtype=np.int64)
    plane = (a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16) >> 5
    return np.clip(plane, 0, 255)


# Table 9-4 (ChromaArrayType 1), Intra_4x4 column: codeNum ->
# coded_block_pattern for me(v)-coded cbp. Machine-checked bijection over
# 0..47 (tests/test_h264_i4x4.py); anchors (0->47, 2->15, 3->0) are the
# widely-quoted values.
CBP_INTRA_FROM_CODE = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
CODE_FROM_CBP_INTRA = {cbp: i for i, cbp in enumerate(CBP_INTRA_FROM_CODE)}


def _intra4_pred(mode: int, t: np.ndarray | None, le: np.ndarray | None,
                 x_corner: int | None) -> np.ndarray | None:
    """4x4 intra prediction (§8.3.1.2, modes 0-8) -> int64 (4,4) or None
    when the mode's required neighbors are absent. `t` is the 8-sample
    top row AFTER top-right substitution (p[x,-1], x 0..7 — callers
    extend with p[3,-1] when the top-right block is undecoded, §8.3.1.2
    sample substitution); `le` is p[-1,y] y 0..3; x_corner is p[-1,-1]."""
    out = np.empty((4, 4), np.int64)
    if mode == 0:                        # Vertical
        if t is None:
            return None
        return np.tile(t[:4], (4, 1))
    if mode == 1:                        # Horizontal
        if le is None:
            return None
        return np.tile(le[:, None], (1, 4))
    if mode == 2:                        # DC
        if t is not None and le is not None:
            dc = (int(t[:4].sum()) + int(le.sum()) + 4) >> 3
        elif t is not None:
            dc = (int(t[:4].sum()) + 2) >> 2
        elif le is not None:
            dc = (int(le.sum()) + 2) >> 2
        else:
            dc = 128
        return np.full((4, 4), dc, np.int64)
    if mode == 3:                        # Diagonal Down-Left
        if t is None:
            return None
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    out[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    out[y, x] = (t[x + y] + 2 * t[x + y + 1]
                                 + t[x + y + 2] + 2) >> 2
        return out
    if mode in (4, 5, 6) and (t is None or le is None or x_corner is None):
        return None
    if mode == 7 and t is None:
        return None
    if mode == 8 and le is None:
        return None

    def tp(i: int) -> int:               # p[i, -1] with p[-1,-1] at i=-1
        return int(x_corner) if i == -1 else int(t[i])

    def lp(i: int) -> int:               # p[-1, i] with p[-1,-1] at i=-1
        return int(x_corner) if i == -1 else int(le[i])

    if mode == 4:                        # Diagonal Down-Right
        for y in range(4):
            for x in range(4):
                if x > y:
                    out[y, x] = (tp(x - y - 2) + 2 * tp(x - y - 1)
                                 + tp(x - y) + 2) >> 2
                elif x < y:
                    out[y, x] = (lp(y - x - 2) + 2 * lp(y - x - 1)
                                 + lp(y - x) + 2) >> 2
                else:
                    out[y, x] = (tp(0) + 2 * int(x_corner) + lp(0) + 2) >> 2
        return out
    if mode == 5:                        # Vertical-Right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    out[y, x] = (tp(x - (y >> 1) - 1)
                                 + tp(x - (y >> 1)) + 1) >> 1
                elif z >= 0:
                    out[y, x] = (tp(x - (y >> 1) - 2)
                                 + 2 * tp(x - (y >> 1) - 1)
                                 + tp(x - (y >> 1)) + 2) >> 2
                elif z == -1:
                    out[y, x] = (lp(0) + 2 * int(x_corner) + tp(0) + 2) >> 2
                else:
                    out[y, x] = (lp(y - 1) + 2 * lp(y - 2)
                                 + lp(y - 3) + 2) >> 2
        return out
    if mode == 6:                        # Horizontal-Down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    out[y, x] = (lp(y - (x >> 1) - 1)
                                 + lp(y - (x >> 1)) + 1) >> 1
                elif z >= 0:
                    out[y, x] = (lp(y - (x >> 1) - 2)
                                 + 2 * lp(y - (x >> 1) - 1)
                                 + lp(y - (x >> 1)) + 2) >> 2
                elif z == -1:
                    out[y, x] = (lp(0) + 2 * int(x_corner) + tp(0) + 2) >> 2
                else:
                    out[y, x] = (tp(x - 1) + 2 * tp(x - 2)
                                 + tp(x - 3) + 2) >> 2
        return out
    if mode == 7:                        # Vertical-Left
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    out[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    out[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
        return out
    if mode == 8:                        # Horizontal-Up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                i = y + (x >> 1)
                if z > 5:
                    out[y, x] = int(le[3])
                elif z == 5:
                    out[y, x] = (int(le[2]) + 3 * int(le[3]) + 2) >> 2
                elif z % 2 == 0:
                    out[y, x] = (int(le[i]) + int(le[i + 1]) + 1) >> 1
                else:
                    out[y, x] = (int(le[i]) + 2 * int(le[i + 1])
                                 + int(le[i + 2]) + 2) >> 2
        return out
    raise ValueError(f"invalid intra_4x4 pred mode {mode}")


def _i4_neighbors(recon: np.ndarray, order: np.ndarray, yy: int, xx: int):
    """Neighbor samples for the 4x4 block whose top-left pixel is
    (yy, xx): (top 8 after top-right substitution, left 4, corner) with
    None where unavailable. `order` holds each 4x4 block's decode rank;
    the top-right quad counts only when ALREADY decoded (§8.3.1.2 sample
    availability under raster MB + §6.4.3 block order)."""
    by, bx = yy // 4, xx // 4
    cur = order[by, bx]
    top = le = corner = None
    if yy > 0:
        t4 = recon[yy - 1, xx:xx + 4].astype(np.int64)
        if (xx + 4 < recon.shape[1] and by > 0
                and order[by - 1, bx + 1] < cur):
            tr = recon[yy - 1, xx + 4:xx + 8].astype(np.int64)
        else:
            tr = np.full(4, t4[3], np.int64)  # substitute p[3,-1]
        top = np.concatenate([t4, tr])
    if xx > 0:
        le = recon[yy:yy + 4, xx - 1].astype(np.int64)
    if yy > 0 and xx > 0:
        corner = int(recon[yy - 1, xx - 1])
    return top, le, corner


def _blk_xy(b: int) -> tuple[int, int]:
    """4x4 luma block scan order inside an MB (§6.4.3): raster of 4x4
    blocks within each 8x8 quadrant, quadrants in raster order."""
    q, i = b // 4, b % 4
    return (q % 2) * 8 + (i % 2) * 4, (q // 2) * 8 + (i // 2) * 4


def _parse_chroma_residual(br, cnnz: np.ndarray, mx: int, my: int,
                           cbp_chroma: int) -> None:
    """Parse-only chroma residual sync (§7.3.5.3.2; grayscale engine):
    ChromaDC when cbp_chroma >= 1, per-block AC with §9.2.1 nC neighbor
    contexts when == 2; updates the chroma TotalCoeff grid. Shared by the
    Intra_16x16 and I_NxN macroblock branches."""
    from lidartree_spark import h264_cavlc as cv

    if cbp_chroma:
        for _comp in range(2):
            cv.decode_residual(br, -1, 4)          # ChromaDCLevel, nC = -1
    if cbp_chroma == 2:
        for comp in range(2):
            for cb in range(4):
                cbx = 2 * mx + cb % 2
                cby = 2 * my + cb // 2
                na = cnnz[comp, cby, cbx - 1] if cbx > 0 else -1
                nb = cnnz[comp, cby - 1, cbx] if cby > 0 else -1
                if na >= 0 and nb >= 0:
                    nc = (int(na) + int(nb) + 1) >> 1
                else:
                    nc = max(int(na), int(nb), 0)
                _, tc = cv.decode_residual(br, nc, 15)
                cnnz[comp, cby, cbx] = tc
    else:
        cnnz[:, 2 * my:2 * my + 2, 2 * mx:2 * mx + 2] = 0


def _blk_order(mb_h: int, mb_w: int) -> np.ndarray:
    """Decode rank of every 4x4 luma block (raster MB order, §6.4.3 block
    order inside the MB) — the availability oracle for top-right samples."""
    order = np.empty((4 * mb_h, 4 * mb_w), np.int64)
    for mb in range(mb_h * mb_w):
        my, mx = divmod(mb, mb_w)
        for b in range(16):
            x, y = _blk_xy(b)
            order[4 * my + y // 4, 4 * mx + x // 4] = mb * 16 + b
    return order


def _nc_luma(nnz: np.ndarray, bx: int, by: int) -> int:
    """§9.2.1 nC from the left/top neighbor 4x4 blocks' stored TotalCoeff
    (-1 in the grid marks unavailable/outside the picture)."""
    na = nnz[by, bx - 1] if bx > 0 else -1
    nb = nnz[by - 1, bx] if by > 0 else -1
    if na >= 0 and nb >= 0:
        return (int(na) + int(nb) + 1) >> 1
    if na >= 0:
        return int(na)
    if nb >= 0:
        return int(nb)
    return 0


def _reconstruct_i16(pred: np.ndarray, dc_z: np.ndarray,
                     ac_blocks: list[list[int]], qp: int) -> np.ndarray:
    """Shared encoder/decoder reconstruction: §8.5.10 DC path + §8.5.12
    AC dequant/inverse transform, then pred + residual, clipped."""
    from lidartree_spark import h264_cavlc as cv

    dc = cv.luma_dc_inverse(dc_z, qp)
    out = np.empty((16, 16), np.uint8)
    for b in range(16):
        x, y = _blk_xy(b)
        z = np.zeros((4, 4), np.int64)
        for k, (i, j) in enumerate(cv.ZIGZAG[1:]):
            z[i, j] = ac_blocks[b][k]
        d = cv.dequant4x4_ac(z, qp)
        d[0, 0] = dc[y // 4, x // 4]
        res = cv.inverse4x4(d)
        out[y:y + 4, x:x + 4] = np.clip(
            pred[y:y + 4, x:x + 4] + res, 0, 255).astype(np.uint8)
    return out


def encode_idr_i16(img: np.ndarray, idr_pic_id: int, qp: int = 10) -> bytes:
    """One IDR coded-slice RBSP, every MB Intra_16x16 with CAVLC residuals
    (§7.3.5, §7.3.5.3.2). Luma carries the image; CodedBlockPatternChroma
    is 0 (flat-chroma grayscale engine), so no chroma residual is coded.
    Per MB the encoder tries every available prediction mode (V/H/DC/Plane)
    on reconstructed neighbors and keeps the minimum-SAE one."""
    from lidartree_spark import h264_cavlc as cv

    if not 0 <= qp <= 51:
        raise ValueError("qp out of [0, 51]")
    padded = _pad_mb(img).astype(np.int64)
    mb_h, mb_w = padded.shape[0] // 16, padded.shape[1] // 16
    recon = np.zeros_like(padded)
    # per-4x4 TotalCoeff grid for nC context; -1 = outside picture
    nnz = np.full((4 * mb_h, 4 * mb_w), 0, np.int64)

    bw = BitWriter()
    bw.ue(0)                       # first_mb_in_slice
    bw.ue(7)                       # slice_type 7: I
    bw.ue(0)                       # pic_parameter_set_id
    bw.u(LOG2_MAX_FRAME_NUM, 0)    # frame_num
    bw.ue(idr_pic_id & 0xFFFF)     # idr_pic_id
    bw.u(1, 0)                     # no_output_of_prior_pics_flag
    bw.u(1, 0)                     # long_term_reference_flag
    bw.se(qp - 26)                 # slice_qp_delta (pic_init_qp = 26)
    bw.ue(1)                       # disable_deblocking_filter_idc = 1

    for my in range(mb_h):
        for mx in range(mb_w):
            src = padded[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
            top = recon[my * 16 - 1, mx * 16:(mx + 1) * 16] \
                if my > 0 else None
            left = recon[my * 16:(my + 1) * 16, mx * 16 - 1] \
                if mx > 0 else None
            best = None
            for mode in (2, 0, 1, 3):
                pred = _intra16_pred(mode, top, left)
                if pred is None:
                    continue
                sae = int(np.abs(src - pred).sum())
                if best is None or sae < best[0]:
                    best = (sae, mode, pred)
            _, mode, pred = best
            res = src - pred
            # transform: 16 core transforms, DC split through Hadamard
            w_blocks, dc = [], np.zeros((4, 4), np.int64)
            for b in range(16):
                x, y = _blk_xy(b)
                w = cv.forward4x4(res[y:y + 4, x:x + 4])
                dc[y // 4, x // 4] = w[0, 0]
                w_blocks.append(w)
            dc_z = cv.luma_dc_forward(dc, qp)
            ac_q = []
            for b in range(16):
                z = cv.quant4x4(w_blocks[b], qp)
                x, y = _blk_xy(b)
                ac_q.append([int(z[i, j]) for i, j in cv.ZIGZAG[1:]])
            cbp_luma = 15 if any(any(a) for a in ac_q) else 0
            mb_type = 1 + mode + 12 * (1 if cbp_luma else 0)
            bw.ue(mb_type)
            bw.ue(0)               # intra_chroma_pred_mode: DC
            bw.se(0)               # mb_qp_delta
            # Intra16x16DCLevel: nC as for luma blk 0 (§9.2.1)
            bx0, by0 = 4 * mx, 4 * my
            dc_scan = [int(dc_z[i, j]) for i, j in cv.ZIGZAG]
            cv.encode_residual(bw, dc_scan, _nc_luma(nnz, bx0, by0), 16)
            if cbp_luma:
                for b in range(16):
                    x, y = _blk_xy(b)
                    bx, by = bx0 + x // 4, by0 + y // 4
                    tc = cv.encode_residual(
                        bw, ac_q[b], _nc_luma(nnz, bx, by), 15)
                    nnz[by, bx] = tc
            else:
                nnz[by0:by0 + 4, bx0:bx0 + 4] = 0
                ac_q = [[0] * 15 for _ in range(16)]
            recon[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
                _reconstruct_i16(pred, dc_z, ac_q, qp)
    bw.rbsp_trailing()
    return bw.rbsp()


def encode_idr_i4x4(img: np.ndarray, idr_pic_id: int, qp: int = 10) -> bytes:
    """One IDR coded-slice RBSP, every MB I_NxN (Intra_4x4, mb_type 0)
    with CAVLC residuals. Per 4x4 block the encoder tries all nine
    §8.3.1.2 prediction modes whose neighbors exist on the RECONSTRUCTED
    frame (blocks reconstruct immediately, in §6.4.3 order, exactly as
    the decoder will), keeps the minimum-SAE one, and codes it through
    the §8.3.1.1 most-probable-mode syntax. coded_block_pattern is
    me(v)-mapped through Table 9-4; CodedBlockPatternChroma stays 0
    (grayscale engine)."""
    from lidartree_spark import h264_cavlc as cv

    if not 0 <= qp <= 51:
        raise ValueError("qp out of [0, 51]")
    padded = _pad_mb(img).astype(np.int64)
    mb_h, mb_w = padded.shape[0] // 16, padded.shape[1] // 16
    recon = np.zeros(padded.shape, np.uint8)
    nnz = np.zeros((4 * mb_h, 4 * mb_w), np.int64)
    modes = np.full((4 * mb_h, 4 * mb_w), -1, np.int64)
    order = _blk_order(mb_h, mb_w)

    bw = BitWriter()
    bw.ue(0)                       # first_mb_in_slice
    bw.ue(7)                       # slice_type 7: I
    bw.ue(0)                       # pic_parameter_set_id
    bw.u(LOG2_MAX_FRAME_NUM, 0)    # frame_num
    bw.ue(idr_pic_id & 0xFFFF)     # idr_pic_id
    bw.u(1, 0)                     # no_output_of_prior_pics_flag
    bw.u(1, 0)                     # long_term_reference_flag
    bw.se(qp - 26)                 # slice_qp_delta
    bw.ue(1)                       # disable_deblocking_filter_idc = 1

    for my in range(mb_h):
        for mx in range(mb_w):
            bx0, by0 = 4 * mx, 4 * my
            # pass 1: per block choose mode, quantize, reconstruct (the
            # decoder's own dequant path), remember syntax elements
            blk_modes, blk_coeffs = [], []
            for b in range(16):
                x, y = _blk_xy(b)
                yy, xx = my * 16 + y, mx * 16 + x
                src = padded[yy:yy + 4, xx:xx + 4]
                top, le, corner = _i4_neighbors(recon, order, yy, xx)
                best = None
                for m in range(9):
                    pred = _intra4_pred(m, top, le, corner)
                    if pred is None:
                        continue
                    sae = int(np.abs(src - pred).sum())
                    if best is None or sae < best[0]:
                        best = (sae, m, pred)
                _, m, pred = best
                z = cv.quant4x4(cv.forward4x4(src - pred), qp)
                scan = [int(z[i, j]) for i, j in cv.ZIGZAG]
                blk_modes.append(m)
                blk_coeffs.append(scan)
                res = cv.inverse4x4(cv.dequant4x4_ac(z, qp))
                recon[yy:yy + 4, xx:xx + 4] = \
                    np.clip(pred + res, 0, 255).astype(np.uint8)
            cbp_luma = 0
            for g in range(4):
                if any(any(blk_coeffs[g * 4 + i]) for i in range(4)):
                    cbp_luma |= 1 << g
            # groups with a zero cbp bit decode as zero residual — which
            # they already are, so recon above stays decoder-exact
            bw.ue(0)               # mb_type: I_NxN
            for b in range(16):
                x, y = _blk_xy(b)
                bx, by = bx0 + x // 4, by0 + y // 4
                ma = modes[by, bx - 1] if bx > 0 else -1
                mbv = modes[by - 1, bx] if by > 0 else -1
                pm = 2 if (ma < 0 or mbv < 0) else min(int(ma), int(mbv))
                m = blk_modes[b]
                if m == pm:
                    bw.u(1, 1)
                else:
                    bw.u(1, 0)
                    bw.u(3, m if m < pm else m - 1)
                modes[by, bx] = m
            bw.ue(0)               # intra_chroma_pred_mode: DC
            bw.ue(CODE_FROM_CBP_INTRA[cbp_luma])  # cbp (chroma part 0)
            if cbp_luma:
                bw.se(0)           # mb_qp_delta
            for b in range(16):
                x, y = _blk_xy(b)
                bx, by = bx0 + x // 4, by0 + y // 4
                if cbp_luma & (1 << (b // 4)):
                    tc = cv.encode_residual(
                        bw, blk_coeffs[b], _nc_luma(nnz, bx, by), 16)
                    nnz[by, bx] = tc
                else:
                    nnz[by, bx] = 0
    bw.rbsp_trailing()
    return bw.rbsp()


def encode_h264_cavlc(frames: np.ndarray, qp: int = 10,
                      mb_mode: str = "i16x16") \
        -> tuple[bytes, bytes, list[bytes]]:
    """(n, h, w) frames -> (sps_nal, pps_nal, [slice_nal]), every MB
    CAVLC-coded (real entropy coding, lossy per qp). mb_mode selects the
    macroblock type: 'i16x16' (Intra_16x16) or 'i4x4' (I_NxN per-4x4
    intra — finer prediction, better on detailed content)."""
    if mb_mode not in ("i16x16", "i4x4"):
        raise ValueError(f"unknown mb_mode {mb_mode!r}")
    f = np.asarray(frames)
    if f.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    if f.dtype != np.uint8:
        f = np.clip(np.round(f.astype(np.float64) * 255.0), 0, 255) \
            .astype(np.uint8)
    n, h, w = f.shape
    sps = nal(7, encode_sps(w, h))
    pps = nal(8, encode_pps(deblock_control=True))
    enc = encode_idr_i16 if mb_mode == "i16x16" else encode_idr_i4x4
    slices = [nal(5, enc(f[i], i, qp)) for i in range(n)]
    return sps, pps, slices


# --------------------------------------------------------------------------
# decoder

def parse_sps(rbsp: bytes) -> dict:
    br = BitReader(rbsp)
    profile_idc = br.u(8)
    br.u(8)  # constraint flags + reserved
    level_idc = br.u(8)
    br.ue()  # seq_parameter_set_id
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise NotImplementedError(
            f"H.264 profile_idc {profile_idc} (High-family SPS syntax: "
            "chroma_format_idc/scaling lists) not supported")
    log2_max_frame_num = br.ue() + 4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    br.ue()  # max_num_ref_frames
    br.u(1)  # gaps_in_frame_num_value_allowed_flag
    mb_w = br.ue() + 1
    mb_h_units = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlaced (frame_mbs_only_flag=0) "
                                  "H.264 not supported")
    br.u(1)  # direct_8x8_inference_flag
    crop = [0, 0, 0, 0]
    if br.u(1):  # frame_cropping_flag
        crop = [br.ue(), br.ue(), br.ue(), br.ue()]  # l, r, t, b
    return {
        "profile_idc": profile_idc, "level_idc": level_idc,
        "log2_max_frame_num": log2_max_frame_num, "poc_type": poc_type,
        "mb_w": mb_w, "mb_h": mb_h_units,
        "w": 16 * mb_w - 2 * (crop[0] + crop[1]),
        "h": 16 * mb_h_units - 2 * (crop[2] + crop[3]),
        "crop": crop,
    }


def parse_pps(rbsp: bytes) -> dict:
    br = BitReader(rbsp)
    br.ue()  # pic_parameter_set_id
    br.ue()  # seq_parameter_set_id
    entropy = br.u(1)
    if entropy:
        raise NotImplementedError("CABAC (entropy_coding_mode_flag=1) "
                                  "H.264 not supported")
    br.u(1)  # bottom_field_pic_order_in_frame_present_flag
    if br.ue() != 0:  # num_slice_groups_minus1
        raise NotImplementedError("H.264 slice groups (FMO) not supported")
    br.ue()
    br.ue()
    br.u(1)
    br.u(2)
    pic_init_qp_minus26 = br.se()
    br.se()
    br.se()
    deblock_present = br.u(1)
    br.u(1)  # constrained_intra_pred_flag
    br.u(1)  # redundant_pic_cnt_present_flag
    return {"deblocking_filter_control_present_flag": deblock_present,
            "pic_init_qp_minus26": pic_init_qp_minus26}


def decode_slice_i(rbsp: bytes, sps: dict, pps: dict) -> np.ndarray:
    """Decode one I-slice RBSP -> (16*mb_h, 16*mb_w) luma. Handles I_PCM
    (mb_type 25), CAVLC Intra_16x16 (mb_type 1..24) and CAVLC I_NxN
    (mb_type 0: per-4x4 intra, all nine §8.3.1.2 prediction modes)
    macroblocks, mixed freely.
    Chroma residuals are parsed for bitstream sync but not reconstructed
    (grayscale engine). A stream with the deblocking filter ENABLED would
    need §8.7 loop filtering for exact output, which is out of scope —
    raises rather than returning silently-unfiltered pixels (our encoder
    writes deblocking_filter_control_present_flag=0 streams; those carry
    no deblocking semantics for all-intra... the filter applies by default,
    so only accept streams whose slices disable it explicitly or that are
    all-I_PCM, where the filter is a no-op by §8.7's bS derivation on PCM
    edges being irrelevant to PCM samples themselves)."""
    from lidartree_spark import h264_cavlc as cv

    br = BitReader(rbsp)
    if br.ue() != 0:
        raise NotImplementedError("multi-slice H.264 pictures not supported")
    slice_type = br.ue()
    if slice_type % 5 != 2:  # 2/7 = I slice
        raise NotImplementedError(
            f"H.264 slice_type {slice_type} (inter prediction) not supported")
    br.ue()                          # pic_parameter_set_id
    br.u(sps["log2_max_frame_num"])  # frame_num
    # nal_unit_type 5 (IDR) assumed by caller for idr_pic_id presence
    br.ue()                          # idr_pic_id
    if sps["poc_type"] == 0:
        raise NotImplementedError("pic_order_cnt_type 0 slice syntax "
                                  "not supported")
    br.u(1)  # no_output_of_prior_pics_flag
    br.u(1)  # long_term_reference_flag
    qp = 26 + pps.get("pic_init_qp_minus26", 0) + br.se()
    deblock_disabled = False
    if pps["deblocking_filter_control_present_flag"]:
        idc = br.ue()  # disable_deblocking_filter_idc
        deblock_disabled = (idc == 1)
        if idc != 1:
            br.se()
            br.se()
    mb_w, mb_h = sps["mb_w"], sps["mb_h"]
    luma = np.zeros((16 * mb_h, 16 * mb_w), np.uint8)
    nnz = np.zeros((4 * mb_h, 4 * mb_w), np.int64)       # luma AC TotalCoeff
    cnnz = np.zeros((2, 2 * mb_h, 2 * mb_w), np.int64)   # chroma AC, Cb/Cr
    # per-4x4 intra pred modes for §8.3.1.1 mode prediction: non-I_NxN MBs
    # contribute 2 (DC); -1 only ever read for out-of-picture neighbors
    modes = np.full((4 * mb_h, 4 * mb_w), -1, np.int64)
    order = _blk_order(mb_h, mb_w)
    for mb in range(mb_w * mb_h):
        my, mx = divmod(mb, mb_w)
        mb_type = br.ue()
        if mb_type == 25:  # I_PCM
            br.align()
            block = np.frombuffer(br.bytes_aligned(256), np.uint8)
            luma[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
                block.reshape(16, 16)
            br.bytes_aligned(128)  # chroma, discarded (grayscale engine)
            # §9.2.1: PCM macroblock blocks count as 16 coefficients
            nnz[4 * my:4 * my + 4, 4 * mx:4 * mx + 4] = 16
            cnnz[:, 2 * my:2 * my + 2, 2 * mx:2 * mx + 2] = 16
            modes[4 * my:4 * my + 4, 4 * mx:4 * mx + 4] = 2
            continue
        if mb_type > 25:
            raise ValueError(f"invalid I-slice mb_type {mb_type}")
        if not deblock_disabled:
            # §8.7 applies the loop filter by default; decoding an
            # entropy-coded slice without it would silently diverge from a
            # conformant decoder on block edges. (All-I_PCM slices are
            # exempt: PCM macroblocks deblock at QP 0, where the
            # alpha/beta thresholds are 0 and no edge ever filters.)
            raise NotImplementedError(
                "H.264 deblocking filter (§8.7) not implemented: this "
                "entropy-coded slice leaves it enabled; only streams with "
                "disable_deblocking_filter_idc=1 decode exactly")
        bx0, by0 = 4 * mx, 4 * my
        if mb_type == 0:               # I_NxN (Intra_4x4), CAVLC
            # mb_pred (§7.3.5.1): prev_intra4x4_pred_mode_flag / rem per
            # block; predicted mode = min(left, top) with DC fallback
            mb_modes = []
            for b in range(16):
                x, y = _blk_xy(b)
                bx, by = bx0 + x // 4, by0 + y // 4
                ma = modes[by, bx - 1] if bx > 0 else -1
                mbv = modes[by - 1, bx] if by > 0 else -1
                pm = 2 if (ma < 0 or mbv < 0) else min(int(ma), int(mbv))
                if br.u(1):
                    m = pm
                else:
                    rem = br.u(3)
                    m = rem if rem < pm else rem + 1
                modes[by, bx] = m
                mb_modes.append(m)
            br.ue()                    # intra_chroma_pred_mode
            code = br.ue()
            if code > 47:
                raise ValueError("invalid coded_block_pattern codeNum")
            cbp = CBP_INTRA_FROM_CODE[code]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            if cbp:
                qp = (qp + br.se()) % 52
            for b in range(16):
                x, y = _blk_xy(b)
                bx, by = bx0 + x // 4, by0 + y // 4
                if cbp_luma & (1 << (b // 4)):
                    coeffs, tc = cv.decode_residual(
                        br, _nc_luma(nnz, bx, by), 16)
                    nnz[by, bx] = tc
                else:
                    coeffs = [0] * 16
                    nnz[by, bx] = 0
                yy, xx = my * 16 + y, mx * 16 + x
                top, le, corner = _i4_neighbors(luma, order, yy, xx)
                pred = _intra4_pred(mb_modes[b], top, le, corner)
                if pred is None:
                    raise ValueError("intra_4x4 mode needs unavailable "
                                     "neighbors (corrupt stream)")
                z = np.zeros((4, 4), np.int64)
                for kk, (i, j) in enumerate(cv.ZIGZAG):
                    z[i, j] = coeffs[kk]
                res = cv.inverse4x4(cv.dequant4x4_ac(z, qp))
                luma[yy:yy + 4, xx:xx + 4] = \
                    np.clip(pred + res, 0, 255).astype(np.uint8)
            _parse_chroma_residual(br, cnnz, mx, my, cbp_chroma)
            continue
        k = mb_type - 1
        pred_mode, cbp_chroma = k % 4, (k // 4) % 3
        cbp_luma = 15 if k >= 12 else 0
        modes[by0:by0 + 4, bx0:bx0 + 4] = 2  # I16 MBs predict as DC (§8.3.1.1)
        br.ue()                    # intra_chroma_pred_mode (chroma unused)
        qp = (qp + br.se()) % 52   # mb_qp_delta (§7.4.5 modular wrap)
        top = luma[my * 16 - 1, mx * 16:(mx + 1) * 16].astype(np.int64) \
            if my > 0 else None
        left = luma[my * 16:(my + 1) * 16, mx * 16 - 1].astype(np.int64) \
            if mx > 0 else None
        pred = _intra16_pred(pred_mode, top, left)
        if pred is None:
            raise ValueError("intra prediction mode needs unavailable "
                             "neighbors (corrupt stream)")
        bx0, by0 = 4 * mx, 4 * my
        dc_scan, _ = cv.decode_residual(br, _nc_luma(nnz, bx0, by0), 16)
        dc_z = np.zeros((4, 4), np.int64)
        for kk, (i, j) in enumerate(cv.ZIGZAG):
            dc_z[i, j] = dc_scan[kk]
        ac_blocks = []
        if cbp_luma:
            for b in range(16):
                x, y = _blk_xy(b)
                bx, by = bx0 + x // 4, by0 + y // 4
                coeffs, tc = cv.decode_residual(
                    br, _nc_luma(nnz, bx, by), 15)
                nnz[by, bx] = tc
                ac_blocks.append(coeffs)
        else:
            nnz[by0:by0 + 4, bx0:bx0 + 4] = 0
            ac_blocks = [[0] * 15 for _ in range(16)]
        _parse_chroma_residual(br, cnnz, mx, my, cbp_chroma)
        luma[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
            _reconstruct_i16(pred, dc_z, ac_blocks, qp)
    if br.more_rbsp_data():
        raise ValueError("trailing macroblock data beyond PicSizeInMbs")
    return luma


# kept name: the I_PCM-era public API, now decoding the general I-slice set
decode_slice_ipcm = decode_slice_i


def decode_h264_ipcm(sps_nal: bytes, pps_nal: bytes,
                     slice_nals: list[bytes]) -> np.ndarray:
    """NAL units (header + EBSP) -> (n, h, w) uint8 frames."""
    if sps_nal[0] & 0x1F != 7:
        raise ValueError("expected SPS NAL (type 7)")
    if pps_nal[0] & 0x1F != 8:
        raise ValueError("expected PPS NAL (type 8)")
    sps = parse_sps(ebsp_to_rbsp(sps_nal[1:]))
    pps = parse_pps(ebsp_to_rbsp(pps_nal[1:]))
    frames = []
    for s in slice_nals:
        if s[0] & 0x80:
            raise ValueError("forbidden_zero_bit set")
        if s[0] & 0x1F not in (1, 5):
            continue  # SEI/AUD/filler — legal to skip
        if s[0] & 0x1F == 1:
            raise NotImplementedError("non-IDR coded slices not supported "
                                      "(all-IDR I_PCM subset)")
        full = decode_slice_ipcm(ebsp_to_rbsp(s[1:]), sps, pps)
        frames.append(full[:sps["h"], :sps["w"]])
    return np.stack(frames)


def split_length_prefixed(buf: bytes, length_size: int = 4) -> list[bytes]:
    """MP4-sample NAL framing (§5.3.4.2 of 14496-15): [len][NAL]..."""
    nals, off = [], 0
    while off + length_size <= len(buf):
        ln = int.from_bytes(buf[off:off + length_size], "big")
        off += length_size
        if ln == 0 or off + ln > len(buf):
            raise ValueError("corrupt length-prefixed NAL stream")
        nals.append(buf[off:off + ln])
        off += ln
    return nals
