"""LASzip (.laz) codec — decode AND encode — for LAS 1.2 point formats
0/1; pure Python/numpy, no external library.

Closes the last source-format gap (VERDICT r4 ask #5, option A): the
reference's own bundled tile is compressed
(/root/reference/inst/extdata/las_chablais3.laz, read at common.R:16-20),
so real lidaRtRee users arrive holding .laz. This module decodes the
classic LASzip stream re-derived from PUBLIC descriptions: the LASzip
paper (Isenburg, "LASzip: lossless compression of LiDAR data", PE&RS
2013) and Amir Said's FastAC adaptive arithmetic coder ("Introduction to
Arithmetic Coding — Theory and Practice", HPL-2004-76), which LASzip
builds on. Supported surface, loud-fail beyond it:

  compressor 2 (POINTWISE_CHUNKED) · coder 0 (arithmetic)
  items POINT10 v2 (+ optional GPSTIME11 v2) == point formats 0/1

Scale shape: a .laz stream is CHUNKED (default 50 000 points/chunk) with
a byte-exact chunk table at the end, so chunks are independent decode
units — the distributed reader maps one task per chunk (las.read_las),
exactly like the record-range chunking of the uncompressed path. The
per-chunk decode is sequential by construction (adaptive models), which
is true of every LASzip implementation; parallelism comes from chunk
count, and at 10^12 points there are ~2x10^7 chunks.

Correctness evidence (tests/test_laz.py): decoding the real
las_chablais3.laz yields exactly n_records points whose integer
min/max X/Y/Z equal the header bbox to the last unit — adaptive
arithmetic coding desynchronizes catastrophically on any model slip, so
a full-stream decode that lands the bbox exactly is a stream-wide
checksum, not a spot check. The encoder is the exact mirror (same
models, same state transitions): re-encoding the decoded reference tile
at full attribute fidelity (n_returns included) round-trips every
column bit-exactly and compresses it to 392,939 bytes vs laszip's own
393,020 — matching the reference implementation's 6.56x ratio on its
own file.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

AC_MIN_LENGTH = 0x01000000
AC_MAX_LENGTH = 0xFFFFFFFF
BM_SHIFT = 13        # bit-model probability precision
BM_MAX = 1 << BM_SHIFT
DM_SHIFT = 15        # data-model (symbol) probability precision
DM_MAX = 1 << DM_SHIFT
_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _i32(v: int) -> int:
    return ((v + 0x80000000) & _M32) - 0x80000000


class _BitModel:
    """Adaptive binary model (FastAC adaptive bit model)."""

    __slots__ = ("count0", "count", "prob0", "cycle", "until")

    def __init__(self):
        self.count0 = 1
        self.count = 2
        self.prob0 = 1 << (BM_SHIFT - 1)
        self.cycle = self.until = 4

    def update(self):
        self.count += self.cycle
        if self.count > BM_MAX:
            self.count = (self.count + 1) >> 1
            self.count0 = (self.count0 + 1) >> 1
            if self.count0 == self.count:
                self.count += 1
        self.prob0 = (self.count0 * (0x80000000 // self.count)) \
            >> (31 - BM_SHIFT)
        self.cycle = min((5 * self.cycle) >> 2, 64)
        self.until = self.cycle


class _Model:
    """Adaptive n-symbol model with cumulative distribution and (for
    n > 16) a decode acceleration table (FastAC adaptive data model)."""

    __slots__ = ("nsym", "last", "table", "table_size", "table_shift",
                 "count", "dist", "total", "cycle", "until")

    def __init__(self, nsym: int):
        self.nsym = nsym
        self.last = nsym - 1
        if nsym > 16:
            table_bits = 3
            while nsym > (1 << (table_bits + 2)):
                table_bits += 1
            self.table_size = 1 << table_bits
            self.table_shift = DM_SHIFT - table_bits
            self.table = [0] * (self.table_size + 2)
        else:
            self.table = None
            self.table_size = self.table_shift = 0
        self.total = 0
        self.cycle = nsym
        self.count = [1] * nsym
        self.dist = [0] * nsym
        self.update()
        self.until = self.cycle = (nsym + 6) >> 1

    def update(self):
        self.total += self.cycle
        if self.total > DM_MAX:
            self.total = 0
            for n in range(self.nsym):
                c = (self.count[n] + 1) >> 1
                self.count[n] = c
                self.total += c
        scale = 0x80000000 // self.total
        ssum = 0
        dist, count = self.dist, self.count
        if self.table is None:
            for k in range(self.nsym):
                dist[k] = (scale * ssum) >> (31 - DM_SHIFT)
                ssum += count[k]
        else:
            tbl = self.table
            s = 0
            for k in range(self.nsym):
                d = (scale * ssum) >> (31 - DM_SHIFT)
                dist[k] = d
                ssum += count[k]
                w = d >> self.table_shift
                while s < w:
                    s += 1
                    tbl[s] = k - 1
            tbl[0] = 0
            while s <= self.table_size:
                s += 1
                tbl[s] = self.nsym - 1
        self.cycle = min((5 * self.cycle) >> 2, (self.nsym + 6) << 3)
        self.until = self.cycle


class _Decoder:
    """Range decoder over a bytes buffer (FastAC decoder interval
    arithmetic: 32-bit value/length, byte-wise renormalization)."""

    __slots__ = ("buf", "pos", "value", "length")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        b = buf
        self.value = (b[pos] << 24) | (b[pos + 1] << 16) \
            | (b[pos + 2] << 8) | b[pos + 3]
        self.pos = pos + 4
        self.length = AC_MAX_LENGTH

    def _renorm(self):
        v, ln, b, p = self.value, self.length, self.buf, self.pos
        while True:
            v = ((v << 8) & _M32) | b[p]
            p += 1
            ln = (ln << 8) & _M32
            if ln >= AC_MIN_LENGTH:
                break
        self.value, self.length, self.pos = v, ln, p

    def decode_bit(self, m: _BitModel) -> int:
        # hot path: state in locals, renorm inlined (profiled ~35% of
        # chunk decode before this shape)
        value = self.value
        length = self.length
        x = m.prob0 * (length >> BM_SHIFT)
        if value >= x:
            sym = 1
            value -= x
            length -= x
        else:
            sym = 0
            length = x
            m.count0 += 1
        if length < AC_MIN_LENGTH:
            b, p = self.buf, self.pos
            while True:
                value = ((value << 8) & _M32) | b[p]
                p += 1
                length = (length << 8) & _M32
                if length >= AC_MIN_LENGTH:
                    break
            self.pos = p
        self.value = value
        self.length = length
        m.until -= 1
        if m.until == 0:
            m.update()
        return sym

    def decode_symbol(self, m: _Model) -> int:
        value = self.value
        length = self.length
        y = length
        dist = m.dist
        tbl = m.table
        if tbl is not None:
            length >>= DM_SHIFT
            dv = value // length
            t = dv >> m.table_shift
            sym = tbl[t]
            n = tbl[t + 1] + 1
            while n > sym + 1:
                k = (sym + n) >> 1
                if dist[k] > dv:
                    n = k
                else:
                    sym = k
            x = dist[sym] * length
            if sym != m.last:
                y = dist[sym + 1] * length
        else:
            x = sym = 0
            length >>= DM_SHIFT
            n = m.nsym
            k = n >> 1
            while True:
                z = length * dist[k]
                if z > value:
                    n = k
                    y = z
                else:
                    sym = k
                    x = z
                k = (sym + n) >> 1
                if k == sym:
                    break
        value -= x
        length = y - x
        if length < AC_MIN_LENGTH:
            b, p = self.buf, self.pos
            while True:
                value = ((value << 8) & _M32) | b[p]
                p += 1
                length = (length << 8) & _M32
                if length >= AC_MIN_LENGTH:
                    break
            self.pos = p
        self.value = value
        self.length = length
        m.count[sym] += 1
        m.until -= 1
        if m.until == 0:
            m.update()
        return sym

    def read_short(self) -> int:
        self.length >>= 16
        sym = self.value // self.length
        self.value -= sym * self.length
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_bits(self, bits: int) -> int:
        if bits > 19:
            lower = self.read_short()
            upper = self.read_bits(bits - 16)
            return (upper << 16) | lower
        self.length >>= bits
        sym = self.value // self.length
        self.value -= sym * self.length
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_int(self) -> int:
        lower = self.read_short()
        upper = self.read_short()
        return (upper << 16) | lower


class _IntDecompressor:
    """LASzip integer decompressor: a per-context model over the number
    of corrector bits k, then a k-bit corrector (entropy-coded high bits
    + raw low bits), applied to a prediction."""

    __slots__ = ("dec", "bits_high", "corr_bits", "corr_range", "corr_min",
                 "m_bits", "m_corr0", "m_corr", "k")

    def __init__(self, dec: _Decoder, bits: int = 16, contexts: int = 1,
                 bits_high: int = 8):
        self.dec = dec
        self.bits_high = bits_high
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
        else:
            self.corr_bits = 32
            self.corr_range = 0
            self.corr_min = -0x80000000
        self.m_bits = [_Model(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corr0 = _BitModel()
        self.m_corr = [None] + [_Model(1 << min(k, bits_high))
                                for k in range(1, self.corr_bits + 1)]
        self.k = 0

    def decompress(self, pred: int, context: int = 0) -> int:
        real = pred + self._corrector(self.m_bits[context])
        if self.corr_range:
            if real < 0:
                real += self.corr_range
            elif real >= self.corr_range:
                real -= self.corr_range
        else:
            real = _i32(real)
        return real

    def _corrector(self, m_bits: _Model) -> int:
        dec = self.dec
        k = self.k = dec.decode_symbol(m_bits)
        if k == 0:
            return dec.decode_bit(self.m_corr0)
        if k >= 32:
            return self.corr_min
        if k <= self.bits_high:
            c = dec.decode_symbol(self.m_corr[k])
        else:
            k1 = k - self.bits_high
            c = dec.decode_symbol(self.m_corr[k])
            c = (c << k1) | dec.read_bits(k1)
        # fold the unsigned k-bit code back into the two signed
        # magnitude intervals [2^(k-1)+1, 2^k] / [-(2^k-1), -2^(k-1)]
        if c >= (1 << (k - 1)):
            return c + 1
        return c - ((1 << k) - 1)


class _Median5:
    """Streaming median-of-5 (LASzip's dx/dy predictor state)."""

    __slots__ = ("v", "high")

    def __init__(self):
        self.v = [0, 0, 0, 0, 0]
        self.high = True

    def add(self, x: int):
        v = self.v
        if self.high:
            if x < v[2]:
                v[4] = v[3]
                v[3] = v[2]
                if x < v[0]:
                    v[2] = v[1]
                    v[1] = v[0]
                    v[0] = x
                elif x < v[1]:
                    v[2] = v[1]
                    v[1] = x
                else:
                    v[2] = x
            else:
                if x < v[3]:
                    v[4] = v[3]
                    v[3] = x
                else:
                    v[4] = x
                self.high = False
        else:
            if v[2] < x:
                v[0] = v[1]
                v[1] = v[2]
                if v[4] < x:
                    v[2] = v[3]
                    v[3] = v[4]
                    v[4] = x
                elif v[3] < x:
                    v[2] = v[3]
                    v[3] = x
                else:
                    v[2] = x
            else:
                if v[1] < x:
                    v[0] = v[1]
                    v[1] = x
                else:
                    v[0] = x
                self.high = True

    def get(self) -> int:
        return self.v[2]


# return-count context tables (LASzip paper §point10: the (number of
# returns, return number) pair indexes prediction state)
_RETURN_MAP = (
    (15, 14, 13, 12, 11, 10, 9, 8),
    (14, 0, 1, 3, 6, 10, 10, 9),
    (13, 1, 2, 4, 7, 11, 11, 10),
    (12, 3, 4, 5, 8, 12, 12, 11),
    (11, 6, 7, 8, 9, 13, 13, 12),
    (10, 10, 11, 12, 13, 14, 14, 13),
    (9, 10, 11, 12, 13, 14, 15, 14),
    (8, 9, 10, 11, 12, 13, 14, 15),
)
_RETURN_LEVEL = (
    (0, 1, 2, 3, 4, 5, 6, 7),
    (1, 0, 1, 2, 3, 4, 5, 6),
    (2, 1, 0, 1, 2, 3, 4, 5),
    (3, 2, 1, 0, 1, 2, 3, 4),
    (4, 3, 2, 1, 0, 1, 2, 3),
    (5, 4, 3, 2, 1, 0, 1, 2),
    (6, 5, 4, 3, 2, 1, 0, 1),
    (7, 6, 5, 4, 3, 2, 1, 0),
)


class _Point10v2:
    """POINT10 item decompressor, version 2."""

    def __init__(self, dec: _Decoder, raw20: bytes):
        self.dec = dec
        (x, y, z, _inten, flags, cls, sar, ud, psid) = struct.unpack(
            "<iiiHBBbBH", raw20)
        self.x, self.y, self.z = x, y, z
        # prediction state starts with intensity 0 regardless of the raw
        # first point (encoder and decoder agree on this seed)
        self.intensity = 0
        self.flags = flags
        self.classification = cls
        self.scan_angle_rank = sar & 0xFF
        self.user_data = ud
        self.psid = psid
        self.m_changed = _Model(64)
        self.m_bit_byte: list = [None] * 256
        self.m_classification: list = [None] * 256
        self.m_user_data: list = [None] * 256
        self.m_sar = [_Model(256), _Model(256)]
        self.ic_intensity = _IntDecompressor(dec, 16, 4)
        self.ic_psid = _IntDecompressor(dec, 16)
        self.ic_dx = _IntDecompressor(dec, 32, 2)
        self.ic_dy = _IntDecompressor(dec, 32, 22)
        self.ic_z = _IntDecompressor(dec, 32, 20)
        self.mx = [_Median5() for _ in range(16)]
        self.my = [_Median5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8

    def read(self):
        dec = self.dec
        changed = dec.decode_symbol(self.m_changed)
        if changed:
            if changed & 32:
                m = self.m_bit_byte[self.flags]
                if m is None:
                    m = self.m_bit_byte[self.flags] = _Model(256)
                self.flags = dec.decode_symbol(m)
            r = self.flags & 7
            n = (self.flags >> 3) & 7
            mm = _RETURN_MAP[n][r]
            ll = _RETURN_LEVEL[n][r]
            if changed & 16:
                self.intensity = self.ic_intensity.decompress(
                    self.last_intensity[mm], mm if mm < 3 else 3)
                self.last_intensity[mm] = self.intensity
            else:
                self.intensity = self.last_intensity[mm]
            if changed & 8:
                mc = self.m_classification[self.classification]
                if mc is None:
                    mc = _Model(256)
                    self.m_classification[self.classification] = mc
                self.classification = dec.decode_symbol(mc)
            if changed & 4:
                f = (self.flags >> 6) & 1
                val = dec.decode_symbol(self.m_sar[f])
                self.scan_angle_rank = (val + self.scan_angle_rank) & 0xFF
            if changed & 2:
                mu = self.m_user_data[self.user_data]
                if mu is None:
                    mu = self.m_user_data[self.user_data] = _Model(256)
                self.user_data = dec.decode_symbol(mu)
            if changed & 1:
                self.psid = self.ic_psid.decompress(self.psid, 0)
        else:
            r = self.flags & 7
            n = (self.flags >> 3) & 7
            mm = _RETURN_MAP[n][r]
            ll = _RETURN_LEVEL[n][r]
        n1 = 1 if n == 1 else 0
        med = self.mx[mm].get()
        diff = self.ic_dx.decompress(med, n1)
        self.x = _i32(self.x + diff)
        self.mx[mm].add(diff)
        med = self.my[mm].get()
        kb = self.ic_dx.k
        diff = self.ic_dy.decompress(
            med, n1 + ((kb & 0xFE) if kb < 20 else 20))
        self.y = _i32(self.y + diff)
        self.my[mm].add(diff)
        kb = (self.ic_dx.k + self.ic_dy.k) // 2
        self.z = self.ic_z.decompress(
            self.last_height[ll], n1 + ((kb & 0xFE) if kb < 18 else 18))
        self.last_height[ll] = self.z


_GT_MULTI = 500
_GT_MULTI_MINUS = -10
_GT_UNCHANGED = _GT_MULTI - _GT_MULTI_MINUS + 1      # 511
_GT_CODE_FULL = _GT_MULTI - _GT_MULTI_MINUS + 2      # 512
_GT_TOTAL = _GT_MULTI - _GT_MULTI_MINUS + 6          # 516


class _Gpstime11v2:
    """GPSTIME11 item decompressor, version 2: four interleaved time
    sequences, each predicting the next stamp as last + multiplier *
    last_diff with entropy-coded multiplier and corrector."""

    def __init__(self, dec: _Decoder, raw8: bytes):
        self.dec = dec
        self.m_multi = _Model(_GT_TOTAL)
        self.m_0diff = _Model(6)
        self.ic = _IntDecompressor(dec, 32, 9)
        (u64,) = struct.unpack("<Q", raw8)
        self.t = [u64, 0, 0, 0]
        self.diff = [0, 0, 0, 0]
        self.extreme = [0, 0, 0, 0]
        self.last = 0
        self.next = 0

    def _read_full(self):
        prev_high = _i32(self.t[self.last] >> 32)
        self.next = (self.next + 1) & 3
        high = self.ic.decompress(prev_high, 8) & _M32
        self.t[self.next] = (high << 32) | self.dec.read_int()
        self.last = self.next
        self.diff[self.last] = 0
        self.extreme[self.last] = 0

    def read(self):
        while True:
            la = self.last
            if self.diff[la] == 0:
                multi = self.dec.decode_symbol(self.m_0diff)
                if multi == 1:       # difference fits 32 bits
                    d = self.ic.decompress(0, 0)
                    self.diff[la] = d
                    self.t[la] = (self.t[la] + d) & _M64
                    self.extreme[la] = 0
                elif multi == 2:     # full 64-bit stamp
                    self._read_full()
                elif multi > 2:      # switch sequence, re-read
                    self.last = (la + multi - 2) & 3
                    continue
                return
            multi = self.dec.decode_symbol(self.m_multi)
            if multi == 1:
                d = self.ic.decompress(self.diff[la], 1)
                self.t[la] = (self.t[la] + d) & _M64
                self.extreme[la] = 0
            elif multi < _GT_UNCHANGED:
                if multi == 0:
                    d = self.ic.decompress(0, 7)
                    self.extreme[la] += 1
                    if self.extreme[la] > 3:
                        self.diff[la] = d
                        self.extreme[la] = 0
                elif multi < _GT_MULTI:
                    d = self.ic.decompress(
                        _i32(multi * self.diff[la]), 2 if multi < 10 else 3)
                elif multi == _GT_MULTI:
                    d = self.ic.decompress(
                        _i32(_GT_MULTI * self.diff[la]), 4)
                    self.extreme[la] += 1
                    if self.extreme[la] > 3:
                        self.diff[la] = d
                        self.extreme[la] = 0
                else:
                    neg = _GT_MULTI - multi          # in [-10, -1]
                    if neg > _GT_MULTI_MINUS:
                        d = self.ic.decompress(_i32(neg * self.diff[la]), 5)
                    else:
                        d = self.ic.decompress(
                            _i32(_GT_MULTI_MINUS * self.diff[la]), 6)
                        self.extreme[la] += 1
                        if self.extreme[la] > 3:
                            self.diff[la] = d
                            self.extreme[la] = 0
                self.t[la] = (self.t[la] + d) & _M64
            elif multi == _GT_CODE_FULL:
                self._read_full()
            elif multi > _GT_CODE_FULL:
                self.last = (la + multi - _GT_CODE_FULL) & 3
                continue
            # multi == _GT_UNCHANGED: stamp repeats
            return

    def value(self) -> float:
        return struct.unpack("<d", struct.pack("<Q", self.t[self.last]))[0]


class _Encoder:
    """Range encoder mirroring _Decoder (FastAC encoder interval
    arithmetic: 32-bit base/length, carry propagation, byte-wise
    renormalization)."""

    __slots__ = ("out", "base", "length")

    def __init__(self):
        self.out = bytearray()
        self.base = 0
        self.length = AC_MAX_LENGTH

    def _carry(self):
        out = self.out
        p = len(out) - 1
        while out[p] == 0xFF:
            out[p] = 0
            p -= 1
        out[p] += 1

    def _renorm(self):
        base, ln, out = self.base, self.length, self.out
        while True:
            out.append((base >> 24) & 0xFF)
            base = (base << 8) & _M32
            ln = (ln << 8) & _M32
            if ln >= AC_MIN_LENGTH:
                break
        self.base, self.length = base, ln

    def encode_bit(self, m: _BitModel, sym: int):
        x = m.prob0 * (self.length >> BM_SHIFT)
        if sym == 0:
            self.length = x
            m.count0 += 1
        else:
            init_base = self.base
            self.base = (self.base + x) & _M32
            self.length -= x
            if init_base > self.base:
                self._carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.until -= 1
        if m.until == 0:
            m.update()

    def encode_symbol(self, m: _Model, sym: int):
        init_base = self.base
        if sym == m.last:
            x = m.dist[sym] * (self.length >> DM_SHIFT)
            self.base = (self.base + x) & _M32
            self.length -= x
        else:
            self.length >>= DM_SHIFT
            x = m.dist[sym] * self.length
            self.base = (self.base + x) & _M32
            self.length = m.dist[sym + 1] * self.length - x
        if init_base > self.base:
            self._carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.count[sym] += 1
        m.until -= 1
        if m.until == 0:
            m.update()

    def write_short(self, sym: int):
        init_base = self.base
        self.length >>= 16
        self.base = (self.base + sym * self.length) & _M32
        if init_base > self.base:
            self._carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()

    def write_bits(self, bits: int, sym: int):
        if bits > 19:
            self.write_short(sym & 0xFFFF)
            self.write_bits(bits - 16, sym >> 16)
            return
        init_base = self.base
        self.length >>= bits
        self.base = (self.base + sym * self.length) & _M32
        if init_base > self.base:
            self._carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()

    def write_int(self, v: int):
        self.write_short(v & 0xFFFF)
        self.write_short((v >> 16) & 0xFFFF)

    def done(self) -> bytes:
        # terminate by emitting the full 32-bit base: any value in
        # [base, base+length) decodes the stream, and base itself is in
        # it; a lazily-reading decoder consumes at most these 4 bytes
        # (plus padding) past its last symbol
        base = self.base
        for _ in range(4):
            self.out.append((base >> 24) & 0xFF)
            base = (base << 8) & _M32
        return bytes(self.out)


class _IntCompressor:
    """Encoder mirror of _IntDecompressor: picks the corrector interval
    k for real - pred, entropy-codes k then the folded code word."""

    __slots__ = ("enc", "bits_high", "corr_bits", "corr_range", "corr_min",
                 "corr_max", "m_bits", "m_corr0", "m_corr", "k")

    def __init__(self, enc: _Encoder, bits: int = 16, contexts: int = 1,
                 bits_high: int = 8):
        self.enc = enc
        self.bits_high = bits_high
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
            self.corr_max = self.corr_min + self.corr_range - 1
        else:
            self.corr_bits = 32
            self.corr_range = 0
            self.corr_min = -0x80000000
            self.corr_max = 0x7FFFFFFF
        self.m_bits = [_Model(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corr0 = _BitModel()
        self.m_corr = [None] + [_Model(1 << min(k, bits_high))
                                for k in range(1, self.corr_bits + 1)]
        self.k = 0

    def compress(self, pred: int, real: int, context: int = 0):
        corr = real - pred
        if self.corr_range:
            if corr < self.corr_min:
                corr += self.corr_range
            elif corr > self.corr_max:
                corr -= self.corr_range
        else:
            corr = _i32(corr)
        self._write_corrector(corr, self.m_bits[context])

    def _write_corrector(self, c: int, m_bits: _Model):
        enc = self.enc
        if 0 <= c <= 1:
            self.k = 0
            enc.encode_symbol(m_bits, 0)
            enc.encode_bit(self.m_corr0, c)
            return
        if c == self.corr_min and self.corr_range == 0:
            self.k = 32
            enc.encode_symbol(m_bits, 32)
            return
        # tightest k with c in [2^(k-1)+1, 2^k] or [-(2^k-1), -2^(k-1)]
        k = (c - 1).bit_length() if c > 0 else (-c).bit_length()
        self.k = k
        enc.encode_symbol(m_bits, k)
        w = c - 1 if c > 0 else c + (1 << k) - 1
        if k <= self.bits_high:
            enc.encode_symbol(self.m_corr[k], w)
        else:
            k1 = k - self.bits_high
            enc.encode_symbol(self.m_corr[k], w >> k1)
            enc.write_bits(k1, w & ((1 << k1) - 1))


class _Point10v2Writer:
    """Encoder mirror of _Point10v2 — identical context/state
    transitions, so the adaptive models stay in lockstep with the
    reader's."""

    def __init__(self, enc: _Encoder, raw20: bytes):
        self.enc = enc
        (x, y, z, _inten, flags, cls, sar, ud, psid) = struct.unpack(
            "<iiiHBBbBH", raw20)
        self.x, self.y, self.z = x, y, z
        self.intensity = 0
        self.flags = flags
        self.classification = cls
        self.scan_angle_rank = sar & 0xFF
        self.user_data = ud
        self.psid = psid
        self.m_changed = _Model(64)
        self.m_bit_byte: list = [None] * 256
        self.m_classification: list = [None] * 256
        self.m_user_data: list = [None] * 256
        self.m_sar = [_Model(256), _Model(256)]
        self.ic_intensity = _IntCompressor(enc, 16, 4)
        self.ic_psid = _IntCompressor(enc, 16)
        self.ic_dx = _IntCompressor(enc, 32, 2)
        self.ic_dy = _IntCompressor(enc, 32, 22)
        self.ic_z = _IntCompressor(enc, 32, 20)
        self.mx = [_Median5() for _ in range(16)]
        self.my = [_Median5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8

    def write(self, x, y, z, intensity, flags, cls, sar, ud, psid):
        enc = self.enc
        sar &= 0xFF
        r = flags & 7
        n = (flags >> 3) & 7
        mm = _RETURN_MAP[n][r]
        ll = _RETURN_LEVEL[n][r]
        changed = (((self.flags != flags) << 5)
                   | ((self.last_intensity[mm] != intensity) << 4)
                   | ((self.classification != cls) << 3)
                   | ((self.scan_angle_rank != sar) << 2)
                   | ((self.user_data != ud) << 1)
                   | (self.psid != psid))
        enc.encode_symbol(self.m_changed, changed)
        if changed:
            if changed & 32:
                m = self.m_bit_byte[self.flags]
                if m is None:
                    m = self.m_bit_byte[self.flags] = _Model(256)
                enc.encode_symbol(m, flags)
                self.flags = flags
            if changed & 16:
                self.ic_intensity.compress(self.last_intensity[mm],
                                           intensity, mm if mm < 3 else 3)
                self.last_intensity[mm] = intensity
            self.intensity = self.last_intensity[mm]
            if changed & 8:
                mc = self.m_classification[self.classification]
                if mc is None:
                    mc = _Model(256)
                    self.m_classification[self.classification] = mc
                enc.encode_symbol(mc, cls)
                self.classification = cls
            if changed & 4:
                f = (flags >> 6) & 1
                enc.encode_symbol(self.m_sar[f],
                                  (sar - self.scan_angle_rank) & 0xFF)
                self.scan_angle_rank = sar
            if changed & 2:
                mu = self.m_user_data[self.user_data]
                if mu is None:
                    mu = self.m_user_data[self.user_data] = _Model(256)
                enc.encode_symbol(mu, ud)
                self.user_data = ud
            if changed & 1:
                self.ic_psid.compress(self.psid, psid, 0)
                self.psid = psid
        n1 = 1 if n == 1 else 0
        diff = _i32(x - self.x)
        self.ic_dx.compress(self.mx[mm].get(), diff, n1)
        self.x = x
        self.mx[mm].add(diff)
        kb = self.ic_dx.k
        diff = _i32(y - self.y)
        self.ic_dy.compress(self.my[mm].get(), diff,
                            n1 + ((kb & 0xFE) if kb < 20 else 20))
        self.y = y
        self.my[mm].add(diff)
        kb = (self.ic_dx.k + self.ic_dy.k) // 2
        self.ic_z.compress(self.last_height[ll], z,
                           n1 + ((kb & 0xFE) if kb < 18 else 18))
        self.z = z
        self.last_height[ll] = z


class _Gpstime11v2Writer:
    """Encoder mirror of _Gpstime11v2."""

    def __init__(self, enc: _Encoder, raw8: bytes):
        self.enc = enc
        self.m_multi = _Model(_GT_TOTAL)
        self.m_0diff = _Model(6)
        self.ic = _IntCompressor(enc, 32, 9)
        (u64,) = struct.unpack("<Q", raw8)
        self.t = [u64, 0, 0, 0]
        self.diff = [0, 0, 0, 0]
        self.extreme = [0, 0, 0, 0]
        self.last = 0
        self.next = 0

    @staticmethod
    def _i64(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    def _fits32(self, d64: int) -> bool:
        return -0x80000000 <= d64 <= 0x7FFFFFFF

    def _write_full(self, u64: int):
        prev_high = _i32(self.t[self.last] >> 32)
        self.next = (self.next + 1) & 3
        self.ic.compress(prev_high, _i32(u64 >> 32), 8)
        self.enc.write_int(u64 & _M32)
        self.t[self.next] = u64
        self.last = self.next
        self.diff[self.last] = 0
        self.extreme[self.last] = 0

    def write(self, u64: int):
        while True:
            la = self.last
            if self.diff[la] == 0:
                if u64 == self.t[la]:
                    self.enc.encode_symbol(self.m_0diff, 0)
                    return
                d64 = self._i64(u64) - self._i64(self.t[la])
                if self._fits32(d64):
                    self.enc.encode_symbol(self.m_0diff, 1)
                    self.ic.compress(0, d64, 0)
                    self.diff[la] = d64
                    self.t[la] = u64
                    self.extreme[la] = 0
                    return
                for i in (1, 2, 3):
                    o64 = self._i64(u64) - self._i64(self.t[(la + i) & 3])
                    if self._fits32(o64) or u64 == self.t[(la + i) & 3]:
                        self.enc.encode_symbol(self.m_0diff, i + 2)
                        self.last = (la + i) & 3
                        break
                else:
                    self.enc.encode_symbol(self.m_0diff, 2)
                    self._write_full(u64)
                    return
                continue
            if u64 == self.t[la]:
                self.enc.encode_symbol(self.m_multi, _GT_UNCHANGED)
                return
            d64 = self._i64(u64) - self._i64(self.t[la])
            if self._fits32(d64):
                # quantize the multiplier the way the reference coder
                # does (float32 ratio, round half away from zero)
                mf = np.float32(d64) / np.float32(self.diff[la])
                multi = int(np.float32(mf) + np.float32(0.5)) if mf >= 0 \
                    else int(np.float32(mf) - np.float32(0.5))
                if multi == 1:
                    self.enc.encode_symbol(self.m_multi, 1)
                    self.ic.compress(self.diff[la], d64, 1)
                    self.extreme[la] = 0
                elif multi > 0:
                    if multi < _GT_MULTI:
                        self.enc.encode_symbol(self.m_multi, multi)
                        self.ic.compress(_i32(multi * self.diff[la]), d64,
                                         2 if multi < 10 else 3)
                    else:
                        self.enc.encode_symbol(self.m_multi, _GT_MULTI)
                        self.ic.compress(_i32(_GT_MULTI * self.diff[la]),
                                         d64, 4)
                        self.extreme[la] += 1
                        if self.extreme[la] > 3:
                            self.diff[la] = d64
                            self.extreme[la] = 0
                elif multi < 0:
                    if multi > _GT_MULTI_MINUS:
                        self.enc.encode_symbol(self.m_multi,
                                               _GT_MULTI - multi)
                        self.ic.compress(_i32(multi * self.diff[la]), d64,
                                         5)
                    else:
                        self.enc.encode_symbol(
                            self.m_multi, _GT_MULTI - _GT_MULTI_MINUS)
                        self.ic.compress(
                            _i32(_GT_MULTI_MINUS * self.diff[la]), d64, 6)
                        self.extreme[la] += 1
                        if self.extreme[la] > 3:
                            self.diff[la] = d64
                            self.extreme[la] = 0
                else:
                    self.enc.encode_symbol(self.m_multi, 0)
                    self.ic.compress(0, d64, 7)
                    self.extreme[la] += 1
                    if self.extreme[la] > 3:
                        self.diff[la] = d64
                        self.extreme[la] = 0
                self.t[la] = u64
                return
            for i in (1, 2, 3):
                o64 = self._i64(u64) - self._i64(self.t[(la + i) & 3])
                if self._fits32(o64) or u64 == self.t[(la + i) & 3]:
                    self.enc.encode_symbol(self.m_multi, _GT_CODE_FULL + i)
                    self.last = (la + i) & 3
                    break
            else:
                self.enc.encode_symbol(self.m_multi, _GT_CODE_FULL)
                self._write_full(u64)
                return
            continue


def parse_laz_vlr(buf: bytes) -> dict:
    """Locate and parse the 'laszip encoded' VLR (record 22204). Raises
    NotImplementedError for any stream outside the supported surface."""
    (n_vlrs,) = struct.unpack_from("<I", buf, 100)
    (hsize,) = struct.unpack_from("<H", buf, 94)
    p = hsize
    for _ in range(n_vlrs):
        uid, rid, rlen = struct.unpack_from("<16sHH", buf, p + 2)
        body = buf[p + 54:p + 54 + rlen]
        p += 54 + rlen
        if uid.rstrip(b"\x00") != b"laszip encoded" or rid != 22204:
            continue
        comp, coder, vmj, vmn, rev, _opts, chunk, _nse, _ose, nit = \
            struct.unpack_from("<HHBBHIIqqH", body, 0)
        items = [struct.unpack_from("<HHH", body, 34 + 6 * j)
                 for j in range(nit)]
        if comp != 2:
            raise NotImplementedError(
                f"LASzip compressor {comp} unsupported (only 2 = "
                f"pointwise-chunked; 3 = layered is LAS 1.4 territory)")
        if coder != 0:
            raise NotImplementedError(f"LASzip coder {coder} (arithmetic "
                                      f"coder = 0 only)")
        if chunk == 0xFFFFFFFF or chunk == 0:
            raise NotImplementedError(
                "variable-size LASzip chunking (chunk_size sentinel "
                "0xFFFFFFFF) unsupported — its chunk table interleaves "
                "per-chunk point counts this reader does not parse")
        for ity, isz, ivr in items:
            if (ity, isz, ivr) not in ((6, 20, 2), (7, 8, 2)):
                raise NotImplementedError(
                    f"LASzip item type={ity} size={isz} version={ivr} "
                    f"unsupported (POINT10 v2 + GPSTIME11 v2 only == "
                    f"point formats 0/1)")
        return {"compressor": comp, "coder": coder,
                "version": (vmj, vmn, rev), "chunk_size": chunk,
                "items": items}
    raise ValueError("no 'laszip encoded' VLR found (not a .laz stream?)")


def parse_chunk_sizes(table_buf: bytes) -> list[int]:
    """Decode the chunk table body (starting at its version field) into
    per-chunk byte counts — delta-compressed with the same integer
    decompressor the points use."""
    version, n_chunks = struct.unpack_from("<II", table_buf, 0)
    if version != 0:
        raise NotImplementedError(f"chunk table version {version}")
    # pad: the range decoder's renorm may look past the encoder's flush
    dec = _Decoder(table_buf + b"\x00" * 16, 8)
    ic = _IntDecompressor(dec, 32, 2)
    sizes = []
    prev = 0
    for _ in range(n_chunks):
        prev = ic.decompress(prev, 1)
        sizes.append(prev)
    return sizes


def assemble_chunks(sizes: list[int], chunks_start: int, n_records: int,
                    chunk_size: int) -> list[tuple]:
    """[(byte_offset, byte_len, n_points), ...] per chunk."""
    out = []
    off = chunks_start
    remaining = n_records
    for sz in sizes:
        npts = min(chunk_size, remaining)
        out.append((off, sz, npts))
        off += sz
        remaining -= npts
    if remaining != 0:
        raise ValueError(
            f"chunk table covers {n_records - remaining} of {n_records} "
            f"points ({len(sizes)} chunks x {chunk_size})")
    return out


def read_chunk_table(buf: bytes, points_start: int,
                     n_records: int, chunk_size: int) -> list[tuple]:
    """Returns [(byte_offset, byte_len, n_points), ...] per chunk. The
    first 8 bytes at points_start hold the absolute chunk-table offset."""
    (table_off,) = struct.unpack_from("<q", buf, points_start)
    if table_off < 0 or table_off + 8 > len(buf):
        raise ValueError(f"chunk table offset {table_off} out of range")
    sizes = parse_chunk_sizes(buf[table_off:])
    return assemble_chunks(sizes, points_start + 8, n_records, chunk_size)


def decode_chunk(buf: bytes, offset: int, n_points: int,
                 has_gpstime: bool) -> dict:
    """Decode one LASzip chunk into numpy column arrays. Sequential by
    construction (adaptive models); chunks are the parallel unit."""
    X = np.empty(n_points, np.int64)
    Y = np.empty(n_points, np.int64)
    Z = np.empty(n_points, np.int64)
    inten = np.empty(n_points, np.int32)
    flags = np.empty(n_points, np.int32)
    cls = np.empty(n_points, np.int32)
    psid = np.empty(n_points, np.int32)
    gps = np.full(n_points, np.nan, np.float64)

    if n_points <= 0:
        return {"X": X, "Y": Y, "Z": Z, "intensity": inten, "flags": flags,
                "classification": cls, "point_source_id": psid, "gps": gps}
    pos = offset
    raw20 = buf[pos:pos + 20]
    pos += 20
    raw8 = b""
    if has_gpstime:
        raw8 = buf[pos:pos + 8]
        pos += 8
    x, y, z, it0, fl0, cl0, _sar, _ud, ps0 = struct.unpack("<iiiHBBbBH",
                                                           raw20)
    X[0], Y[0], Z[0] = x, y, z
    inten[0], flags[0], cls[0], psid[0] = it0, fl0, cl0, ps0
    if has_gpstime:
        gps[0] = struct.unpack("<d", raw8)[0]
    if n_points == 1:
        return {"X": X, "Y": Y, "Z": Z, "intensity": inten, "flags": flags,
                "classification": cls, "point_source_id": psid, "gps": gps}

    dec = _Decoder(buf, pos)
    p10 = _Point10v2(dec, raw20)
    gt = _Gpstime11v2(dec, raw8) if has_gpstime else None
    for i in range(1, n_points):
        p10.read()
        X[i], Y[i], Z[i] = p10.x, p10.y, p10.z
        inten[i] = p10.intensity
        flags[i] = p10.flags
        cls[i] = p10.classification
        psid[i] = p10.psid
        if gt is not None:
            gt.read()
            gps[i] = gt.value()
    return {"X": X, "Y": Y, "Z": Z, "intensity": inten, "flags": flags,
            "classification": cls, "point_source_id": psid, "gps": gps}


def compress_chunk(rec: np.ndarray, has_gps: bool) -> bytes:
    """Compress one chunk of LAS point-record structs (las._DTYPES
    layout): first record raw, the rest through the POINT10/GPSTIME11 v2
    writers sharing one range encoder."""
    first = rec[:1].tobytes()
    out = bytearray(first)
    if len(rec) <= 1:
        return bytes(out)
    enc = _Encoder()
    w10 = _Point10v2Writer(enc, first[:20])
    wgt = _Gpstime11v2Writer(enc, first[20:28]) if has_gps else None
    gps_bits = rec["gps_time"].view("<u8") if has_gps else None
    X, Y, Z = rec["X"], rec["Y"], rec["Z"]
    inten, flags = rec["intensity"], rec["flags"]
    cls, sar = rec["classification"], rec["scan_angle"]
    ud, psid = rec["user_data"], rec["point_source_id"]
    for i in range(1, len(rec)):
        w10.write(int(X[i]), int(Y[i]), int(Z[i]), int(inten[i]),
                  int(flags[i]), int(cls[i]), int(sar[i]), int(ud[i]),
                  int(psid[i]))
        if wgt is not None:
            wgt.write(int(gps_bits[i]))
    out += enc.done()
    return bytes(out)


def build_laz_vlr(point_format: int, chunk_size: int) -> bytes:
    """The 'laszip encoded' VLR (record 22204) for point formats 0/1:
    compressor 2, arithmetic coder, POINT10 v2 (+ GPSTIME11 v2)."""
    items = [(6, 20, 2)]
    if point_format == 1:
        items.append((7, 8, 2))
    body = struct.pack("<HHBBHIIqqH", 2, 0, 2, 2, 0, 0, chunk_size,
                       0, 0, len(items))
    for it in items:
        body += struct.pack("<HHH", *it)
    rec_hdr = struct.pack("<H16sHH32s", 0, b"laszip encoded", 22204,
                          len(body), b"lidartree_spark laszip stream")
    return rec_hdr + body


def encode_laz(x: np.ndarray, y: np.ndarray, z: np.ndarray,
               classification: np.ndarray | None = None,
               intensity: np.ndarray | None = None,
               gps_time: np.ndarray | None = None,
               return_number: np.ndarray | None = None,
               n_returns: np.ndarray | None = None,
               scale: tuple = (0.001, 0.001, 0.001),
               offset: tuple = (0.0, 0.0, 0.0),
               point_format: int | None = None,
               chunk_size: int = 50000) -> bytes:
    """Serialize arrays to a LASzip-compressed .laz byte string (point
    formats 0/1). Quantization/validation semantics are exactly
    las.encode_las's — the records are built by it, then compressed, so
    a .las and a .laz write of the same arrays hold identical point
    structs. The stream is self-consistent with this module's decoder
    (round-trip gated in tests/test_laz.py); byte-compatibility with
    external laszip readers is expected (same VLR, chunk table and coder
    layout) but cannot be exercised in this sandbox."""
    from lidartree_spark import las as _las

    raw = _las.encode_las(x, y, z, classification=classification,
                          intensity=intensity, gps_time=gps_time,
                          return_number=return_number,
                          n_returns=n_returns, scale=scale,
                          offset=offset, point_format=point_format)
    hdr = _las.decode_las_header(raw)
    fmt = hdr["point_format"]
    if fmt not in (0, 1):
        raise NotImplementedError(
            f"LAZ encoding implements point formats 0-1 (got {fmt}; RGB "
            f"formats 2-3 stay .las-only)")
    n = hdr["n_records"]
    dt = _las._DTYPES[fmt]
    rec = np.frombuffer(raw, dtype=dt, count=n,
                        offset=hdr["offset_to_points"])

    head = bytearray(raw[:_las.HEADER_SIZE])
    vlr = build_laz_vlr(fmt, chunk_size)
    head[104] |= 0x80
    struct.pack_into("<I", head, 96, _las.HEADER_SIZE + len(vlr))
    struct.pack_into("<I", head, 100, 1)

    chunks = [compress_chunk(rec[i:i + chunk_size], fmt == 1)
              for i in range(0, n, chunk_size)]
    enc = _Encoder()
    ic = _IntCompressor(enc, 32, 2)
    prev = 0
    for c in chunks:
        ic.compress(prev, len(c), 1)
        prev = len(c)
    table = struct.pack("<II", 0, len(chunks)) + enc.done()

    points_start = len(head) + len(vlr)
    table_off = points_start + 8 + sum(len(c) for c in chunks)
    return (bytes(head) + vlr + struct.pack("<q", table_off)
            + b"".join(chunks) + table)


def decode_laz_points(buf: bytes, hdr: dict | None = None,
                      chunks: list | None = None) -> pd.DataFrame:
    """Decode a whole .laz byte string into the POINTS_SCHEMA columns of
    las.decode_las_points (driver-side convenience; the distributed
    reader decodes per chunk instead)."""
    from lidartree_spark.las import decode_las_header

    if hdr is None:
        hdr = decode_las_header(buf, allow_laz=True)
    vlr = parse_laz_vlr(buf)
    has_gps = any(it[0] == 7 for it in vlr["items"])
    if chunks is None:
        chunks = read_chunk_table(buf, hdr["offset_to_points"],
                                  hdr["n_records"], vlr["chunk_size"])
    if not chunks:  # header-only .laz (n_records == 0)
        parts = [decode_chunk(b"", 0, 0, has_gps)]
    else:
        parts = [decode_chunk(buf, off, npts, has_gps)
                 for off, _sz, npts in chunks]
    cols = {k: np.concatenate([p[k] for p in parts])
            for k in parts[0]}
    return chunk_to_frame(cols, hdr["scale_x"], hdr["scale_y"],
                          hdr["scale_z"], hdr["off_x"], hdr["off_y"],
                          hdr["off_z"])


def chunk_to_frame(cols: dict, sx: float, sy: float, sz: float,
                   ox: float, oy: float, oz: float) -> pd.DataFrame:
    """decode_chunk column dict -> POINTS_SCHEMA frame. The ONE place
    the scale/offset reconstruction and flags decomposition live, so the
    driver-side decoder and the distributed reader (las.read_las) cannot
    drift expression-wise — driver-vs-distributed parity depends on both
    computing the identical doubles."""
    return pd.DataFrame({
        "x": cols["X"] * sx + ox,
        "y": cols["Y"] * sy + oy,
        "z": cols["Z"] * sz + oz,
        "intensity": cols["intensity"],
        "return_number": cols["flags"] & 0x7,
        "n_returns": (cols["flags"] >> 3) & 0x7,
        "classification": cols["classification"],
        "gps_time": cols["gps"],
        "point_source_id": cols["point_source_id"],
    })
