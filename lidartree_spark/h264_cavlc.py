"""H.264 CAVLC entropy layer + 4x4 integer transform/quantization
(ITU-T Rec. H.264 §8.5, §9.2) — the residual engine under the Baseline
I_16x16 codec in h264.py.

Everything here derives from the PUBLIC spec; section/table numbers are
cited inline. The VLC code tables (Tables 9-5, 9-7..9-10) are transcribed
constants. Validation story, stated honestly:
  - every table is machine-checked PREFIX-FREE per context
    (tests/test_h264_cavlc.py) — a transcription collision cannot hide;
  - the 0<=nC<2 coeff_token context plus the level/total_zeros/run_before
    path is pinned by the published worked example that appears in the
    standard texts on CAVLC (block {0,3,-1,0, 0,-1,1,0, 1,0,0,0, 0,0,0,0}
    -> "000010001110010111101101");
  - encoder and decoder invert each other for randomized blocks across
    all nC contexts (hypothesis round-trip), so the engine is exactly
    self-consistent;
  - this sandbox has no second H.264 implementation (no ffmpeg/openh264),
    so cross-implementation interop of the 2<=nC tables is NOT
    independently re-verified here; the structural checks above bound the
    risk to "a wrong-but-consistent constant", never a mis-decode of our
    own streams.

No reference-repo counterpart (cran/lidaRtRee has no video handling).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Zig-zag scan (§8.5.6, frame scan)

ZIGZAG = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
          (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3)]

# --------------------------------------------------------------------------
# Quantization constants (§8.5.12.1). Position classes for a 4x4 block:
# class 0 = {(0,0),(0,2),(2,0),(2,2)}, class 1 = {(1,1),(1,3),(3,1),(3,3)},
# class 2 = the rest. V = LevelScale4x4 (decoder, normative); MF is the
# standard encoder-side multiplier satisfying MF*V ~= 2^17.

_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
      (14, 23, 18), (16, 25, 20), (18, 29, 23)]
_MF = [(13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
       (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559)]


def _pos_class() -> np.ndarray:
    cls = np.full((4, 4), 2, np.int64)
    for i, j in ((0, 0), (0, 2), (2, 0), (2, 2)):
        cls[i, j] = 0
    for i, j in ((1, 1), (1, 3), (3, 1), (3, 3)):
        cls[i, j] = 1
    return cls


_CLS = _pos_class()


def v_matrix(qp: int) -> np.ndarray:
    return np.take(np.array(_V[qp % 6], np.int64), _CLS)


def mf_matrix(qp: int) -> np.ndarray:
    return np.take(np.array(_MF[qp % 6], np.int64), _CLS)


# --------------------------------------------------------------------------
# 4x4 integer core transform (§8.5.12.2 inverse; forward is its standard
# encoder-side inverse, non-normative but exact-inverting at QP=0 scale).

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], np.int64)
_HAD = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                 [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)


def forward4x4(block: np.ndarray) -> np.ndarray:
    """Core transform W = Cf . X . Cf^T on int residuals."""
    x = block.astype(np.int64)
    return _CF @ x @ _CF.T


def inverse4x4(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2: bit-exact inverse transform with >>1 butterflies and the
    final (x + 32) >> 6 rounding. Input d = dequantized coefficients."""
    d = d.astype(np.int64)
    # horizontal (rows of d as columns per spec orientation: apply to rows)
    e0 = d[0] + d[2]
    e1 = d[0] - d[2]
    e2 = (d[1] >> 1) - d[3]
    e3 = d[1] + (d[3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])
    # vertical
    g0 = f[:, 0] + f[:, 2]
    g1 = f[:, 0] - f[:, 2]
    g2 = (f[:, 1] >> 1) - f[:, 3]
    g3 = f[:, 1] + (f[:, 3] >> 1)
    h = np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=1)
    return (h + 32) >> 6


def quant4x4(w: np.ndarray, qp: int, intra: bool = True) -> np.ndarray:
    """Encoder-side quant: z = sign(w) * ((|w|*MF + f) >> qbits)."""
    qbits = 15 + qp // 6
    f = ((1 << qbits) // 3) if intra else ((1 << qbits) // 6)
    mf = mf_matrix(qp)
    return (np.sign(w) * ((np.abs(w) * mf + f) >> qbits)).astype(np.int64)


def dequant4x4_ac(z: np.ndarray, qp: int) -> np.ndarray:
    """§8.5.12.1: d = (z * LevelScale) << (qp/6) — AC positions (and all
    positions of a non-DC-split block)."""
    return (z.astype(np.int64) * v_matrix(qp)) << (qp // 6)


def luma_dc_inverse(z2: np.ndarray, qp: int) -> np.ndarray:
    """§8.5.10: inverse 4x4 Hadamard on the I_16x16 luma DC block, then
    the dedicated DC scaling."""
    f = _HAD @ z2.astype(np.int64) @ _HAD.T
    v00 = _V[qp % 6][0]
    if qp >= 36:
        return (f * v00) << (qp // 6 - 6)
    return (f * v00 + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def luma_dc_forward(dc: np.ndarray, qp: int) -> np.ndarray:
    """Encoder-side DC path inverting luma_dc_inverse. Target scale: the
    decoder places the DC output at d(0,0) NEXT TO dequantized AC
    coefficients, which sit at 4x the forward-transform scale (z*V ~=
    W*MF*V/2^15 = 4W), so the DC path must reconstruct ~4*W00 too.
    dc' = (H.z.H^T) * V00 * 2^(qp/6 - 6) with H.H = 4I solves to
    z = f * 16/(V00 * 2^(qp/6)) ~= f * MF00 >> (13 + qp/6)
    (MF00*V00 ~= 2^17). Non-normative; fidelity is test-bounded."""
    f = _HAD @ dc.astype(np.int64) @ _HAD.T
    qbits = 13 + qp // 6
    mf00 = _MF[qp % 6][0]
    off = (1 << qbits) // 3
    return (np.sign(f) * ((np.abs(f) * mf00 + off) >> qbits)).astype(np.int64)


# --------------------------------------------------------------------------
# CAVLC VLC tables (Table 9-5, 9-7, 9-8, 9-9, 9-10). Encoded as
# {key: bitstring}; bitstrings are the exact codewords, MSB first.
# coeff_token: key = (TrailingOnes, TotalCoeff).

_CT_NC0 = {  # 0 <= nC < 2
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
    (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
    (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
    (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101",
    (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110", (2, 7): "00000000101",
    (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010",
    (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110",
    (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010",
    (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110",
    (2, 11): "00000000001001", (3, 11): "00000000001100",
    (0, 12): "000000000001011", (1, 12): "000000000001010",
    (2, 12): "000000000001101", (3, 12): "00000000001000",
    (0, 13): "0000000000001111", (1, 13): "000000000000001",
    (2, 13): "000000000001001", (3, 13): "000000000001100",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110",
    (2, 14): "0000000000001101", (3, 14): "000000000001000",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010",
    (2, 15): "0000000000001001", (3, 15): "0000000000001100",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110",
    (2, 16): "0000000000000101", (3, 16): "0000000000001000",
}

_CT_NC2 = {  # 2 <= nC < 4
    (0, 0): "11",
    (0, 1): "001011", (1, 1): "10",
    (0, 2): "000111", (1, 2): "00111", (2, 2): "011",
    (0, 3): "0000111", (1, 3): "001010", (2, 3): "001001", (3, 3): "0101",
    (0, 4): "00000111", (1, 4): "000110", (2, 4): "000101", (3, 4): "0100",
    (0, 5): "00000100", (1, 5): "0000110", (2, 5): "0000101",
    (3, 5): "00110",
    (0, 6): "000000111", (1, 6): "00000110", (2, 6): "00000101",
    (3, 6): "001000",
    (0, 7): "00000001111", (1, 7): "000000110", (2, 7): "000000101",
    (3, 7): "000100",
    (0, 8): "00000001011", (1, 8): "00000001110", (2, 8): "00000001101",
    (3, 8): "0000100",
    (0, 9): "000000001111", (1, 9): "00000001010", (2, 9): "00000001001",
    (3, 9): "000000100",
    (0, 10): "000000001011", (1, 10): "000000001110",
    (2, 10): "000000001101", (3, 10): "00000001100",
    (0, 11): "000000001000", (1, 11): "000000001010",
    (2, 11): "000000001001", (3, 11): "00000001000",
    (0, 12): "0000000001111", (1, 12): "0000000001110",
    (2, 12): "0000000001101", (3, 12): "000000001100",
    (0, 13): "0000000001011", (1, 13): "0000000001010",
    (2, 13): "0000000001001", (3, 13): "0000000001100",
    (0, 14): "0000000000111", (1, 14): "00000000001011",
    (2, 14): "0000000000110", (3, 14): "0000000001000",
    (0, 15): "00000000001001", (1, 15): "00000000001000",
    (2, 15): "00000000001010", (3, 15): "0000000000001",
    (0, 16): "00000000000111", (1, 16): "00000000000110",
    (2, 16): "00000000000101", (3, 16): "00000000000100",
}

_CT_NC4 = {  # 4 <= nC < 8
    (0, 0): "1111",
    (0, 1): "001111", (1, 1): "1110",
    (0, 2): "001011", (1, 2): "01111", (2, 2): "1101",
    (0, 3): "001000", (1, 3): "01100", (2, 3): "01110", (3, 3): "1100",
    (0, 4): "0001111", (1, 4): "01010", (2, 4): "01011", (3, 4): "1011",
    (0, 5): "0001011", (1, 5): "01000", (2, 5): "01001", (3, 5): "1010",
    (0, 6): "0001001", (1, 6): "001110", (2, 6): "001101", (3, 6): "1001",
    (0, 7): "0001000", (1, 7): "001010", (2, 7): "001001", (3, 7): "1000",
    (0, 8): "00001111", (1, 8): "0001110", (2, 8): "0001101",
    (3, 8): "01101",
    (0, 9): "00001011", (1, 9): "00001110", (2, 9): "0001010",
    (3, 9): "001100",
    (0, 10): "000001111", (1, 10): "00001010", (2, 10): "00001101",
    (3, 10): "0001100",
    (0, 11): "000001011", (1, 11): "000001110", (2, 11): "00001001",
    (3, 11): "00001100",
    (0, 12): "000001000", (1, 12): "000001010", (2, 12): "000001101",
    (3, 12): "00001000",
    (0, 13): "0000001101", (1, 13): "000000111", (2, 13): "000001001",
    (3, 13): "000001100",
    (0, 14): "0000001001", (1, 14): "0000001100", (2, 14): "0000001011",
    (3, 14): "0000001010",
    (0, 15): "0000000101", (1, 15): "0000001000", (2, 15): "0000000111",
    (3, 15): "0000000110",
    (0, 16): "0000000001", (1, 16): "0000000100", (2, 16): "0000000011",
    (3, 16): "0000000010",
}

_CT_CHROMA_DC = {  # nC == -1 (4:2:0 chroma DC, maxNumCoeff 4)
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010",
    (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010",
    (3, 4): "0000000",
}


def coeff_token_table(nc: int) -> dict | None:
    """None => 6-bit FLC (nC >= 8)."""
    if nc == -1:
        return _CT_CHROMA_DC
    if nc < 2:
        return _CT_NC0
    if nc < 4:
        return _CT_NC2
    if nc < 8:
        return _CT_NC4
    return None


# total_zeros, 4x4 blocks (Tables 9-7 and 9-8): _TZ[TotalCoeff][total_zeros]
_TZ = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# total_zeros, chroma DC 2x2 (Table 9-9(a)): _TZ_CDC[TotalCoeff]
_TZ_CDC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# run_before (Table 9-10): _RB[min(zerosLeft, 7)][run_before]
_RB = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001", "00001",
        "000001", "0000001", "00000001", "000000001", "0000000001",
        "00000000001"],
}


def all_vlc_tables() -> dict[str, dict | list]:
    """Every VLC table, for the structural prefix-freeness tests."""
    out: dict[str, dict | list] = {
        "coeff_token_nc0": _CT_NC0, "coeff_token_nc2": _CT_NC2,
        "coeff_token_nc4": _CT_NC4, "coeff_token_chroma_dc": _CT_CHROMA_DC,
    }
    for tc, codes in _TZ.items():
        out[f"total_zeros_tc{tc}"] = codes
    for tc, codes in _TZ_CDC.items():
        out[f"total_zeros_cdc_tc{tc}"] = codes
    for zl, codes in _RB.items():
        out[f"run_before_zl{zl}"] = codes
    return out


# --------------------------------------------------------------------------
# VLC read/write against h264.BitWriter / h264.BitReader

def _write_code(bw, bits: str) -> None:
    bw.u(len(bits), int(bits, 2))


def _read_vlc(br, table: dict[str, object]) -> object:
    """Read one codeword from a {bitstring: value} dict (prefix-free)."""
    code = ""
    for _ in range(20):
        code += str(br.u(1))
        if code in table:
            return table[code]
    raise ValueError(f"invalid VLC codeword (prefix {code})")


def _invert(table) -> dict[str, object]:
    if isinstance(table, dict):
        return {bits: key for key, bits in table.items()}
    return {bits: i for i, bits in enumerate(table)}


_INV_CACHE: dict[int, dict] = {}


def _inv(table_id: str, table) -> dict:
    key = id(table)
    if key not in _INV_CACHE:
        _INV_CACHE[key] = _invert(table)
    return _INV_CACHE[key]


# --------------------------------------------------------------------------
# residual_block_cavlc (§7.3.5.3.2 syntax, §9.2 parsing)

def encode_residual(bw, coeffs: list[int], nc: int,
                    max_num_coeff: int) -> int:
    """Write one residual block (coeffs in zig-zag scan order, length
    max_num_coeff). Returns TotalCoeff (the caller stores it for nC
    context derivation)."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total_coeff = len(nz)
    # trailing ones: up to 3 final +-1s (scan order tail)
    t1 = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    table = coeff_token_table(nc)
    if table is None:  # 6-bit FLC, nC >= 8
        if total_coeff == 0:
            bw.u(6, 0b000011)
        else:
            bw.u(6, ((total_coeff - 1) << 2) | t1)
    else:
        _write_code(bw, table[(t1, total_coeff)])
    if total_coeff == 0:
        return 0
    # trailing-one signs, highest frequency first
    for _, c in list(reversed(nz))[:t1]:
        bw.u(1, 0 if c > 0 else 1)
    # remaining levels, highest frequency first (§9.2.2 inverse)
    suffix_len = 1 if total_coeff > 10 and t1 < 3 else 0
    first = True
    for _, c in list(reversed(nz))[t1:]:
        level_code = 2 * abs(c) - 2 if c > 0 else 2 * abs(c) - 1
        if first and t1 < 3:
            level_code -= 2
        first = False
        _encode_level_code(bw, level_code, suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        if abs(c) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    total_zeros = nz[-1][0] + 1 - total_coeff
    if total_coeff < max_num_coeff:
        tz_tab = _TZ_CDC[total_coeff] if max_num_coeff == 4 \
            else _TZ[total_coeff]
        _write_code(bw, tz_tab[total_zeros])
    # run_before, highest frequency first, not for the last (lowest) coeff
    zeros_left = total_zeros
    positions = [i for i, _ in nz]
    for k in range(total_coeff - 1, 0, -1):
        if zeros_left <= 0:
            break
        run = positions[k] - positions[k - 1] - 1
        _write_code(bw, _RB[min(zeros_left, 7)][run])
        zeros_left -= run
    return total_coeff


def _encode_level_code(bw, lc: int, suffix_len: int) -> None:
    """Exact inverse of the §9.2.2.1 levelCode reconstruction: write
    level_prefix (zeros + stop 1) and level_suffix so the decoder's
      levelCode = (min(15,prefix) << sl) + suffix
                  [+15 if prefix>=15 and sl==0] [+2^(prefix-3)-4096 if >=16]
    recovers lc."""
    if suffix_len == 0:
        if lc < 14:
            bw.u(lc + 1, 1)
            return
        if lc < 30:
            bw.u(15, 1)       # level_prefix 14 -> 4-bit suffix
            bw.u(4, lc - 14)
            return
        rem = lc - 30         # (15 << 0) + the sl==0 "+15"
    else:
        if (lc >> suffix_len) < 15:
            bw.u((lc >> suffix_len) + 1, 1)
            bw.u(suffix_len, lc & ((1 << suffix_len) - 1))
            return
        rem = lc - (15 << suffix_len)
    prefix = 15
    while True:
        base = 0 if prefix == 15 else (1 << (prefix - 3)) - 4096
        if 0 <= rem - base < (1 << (prefix - 3)):
            bw.u(prefix + 1, 1)
            bw.u(prefix - 3, rem - base)
            return
        prefix += 1
        if prefix > 30:
            raise ValueError("level too large for CAVLC escape")


def decode_residual(br, nc: int, max_num_coeff: int) -> tuple[list[int],
                                                              int]:
    """Parse one residual block -> (coeffs in zig-zag order, TotalCoeff)."""
    table = coeff_token_table(nc)
    if table is None:
        code = br.u(6)
        if code == 0b000011:
            total_coeff, t1 = 0, 0
        else:
            total_coeff, t1 = (code >> 2) + 1, code & 3
    else:
        t1, total_coeff = _read_vlc(br, _inv("ct", table))
    coeffs = [0] * max_num_coeff
    if total_coeff == 0:
        return coeffs, 0
    levels = []
    for _ in range(t1):
        levels.append(-1 if br.u(1) else 1)
    suffix_len = 1 if total_coeff > 10 and t1 < 3 else 0
    for i in range(total_coeff - t1):
        # level_prefix: zeros then a 1
        prefix = 0
        while br.u(1) == 0:
            prefix += 1
            if prefix > 30:
                raise ValueError("malformed level_prefix")
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        else:
            size = suffix_len
        suffix = br.u(size) if size else 0
        level_code = (min(15, prefix) << suffix_len) + suffix
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1 < 3:
            level_code += 2
        level = (level_code + 2) >> 1 if level_code % 2 == 0 \
            else -((level_code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if total_coeff < max_num_coeff:
        tz_tab = _TZ_CDC[total_coeff] if max_num_coeff == 4 \
            else _TZ[total_coeff]
        total_zeros = _read_vlc(br, _inv("tz", tz_tab))
    else:
        total_zeros = 0
    # place coefficients, highest frequency first
    zeros_left = total_zeros
    idx = total_coeff + total_zeros - 1
    for k, level in enumerate(levels):
        coeffs[idx] = level
        last = (k == total_coeff - 1)
        if last:
            break
        if zeros_left > 0:
            run = _read_vlc(br, _inv("rb", _RB[min(zeros_left, 7)]))
        else:
            run = 0
        zeros_left -= run
        idx -= run + 1
    return coeffs, total_coeff
