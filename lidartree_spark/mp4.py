"""Pure-python MP4 (ISO base media file format) video codec.

Real spec-compliant ISO-BMFF files — ftyp + mdat + moov with a full sample
table (stsd VisualSampleEntry, stts/stsc/stsz/stco) — with two sample
codecs, both implemented from their public specs:

- 'jpeg' (QuickTime/MP4 photo-JPEG): every sample is a baseline JPEG from
  lidartree_spark.jpeg. Lossy; players and ffmpeg demux it natively.
- 'avc1' (H.264/AVC, ISO/IEC 14496-15 carriage): every sample is one IDR
  all-I_PCM coded slice from lidartree_spark.h264, with SPS/PPS carried
  out-of-band in the avcC AVCDecoderConfigurationRecord. Lossless up to
  the spec's PCM!=0 constraint (black pixels clamp 0 -> 1). Decoding an
  entropy-coded (CAVLC/CABAC) H.264 track raises a SPECIFIC
  NotImplementedError from the h264 module — the container and NAL/slice
  parsing are real for every stream; only the entropy engine is out of
  scope.

The demuxer walks the real box tree and trusts only the sample table:
sample byte ranges come from stsz/stsc/stco (absolute file offsets, any
chunking) or 64-bit co64, and the video track is selected by its 'vide'
handler (never "first trak"), so third-party MP4s with extra boxes (free,
udta, uuid) or leading audio tracks demux too.

Box layout reference: ISO/IEC 14496-12 / 14496-15 (public specs); no
reference-repo counterpart (the R package has no video handling) — this
exists for the multimodal column family (mission brief) only.
"""

from __future__ import annotations

import struct

import numpy as np

from lidartree_spark.h264 import (decode_h264_ipcm, encode_h264_ipcm,
                                  split_length_prefixed)
from lidartree_spark.jpeg import decode_jpeg_gray, encode_jpeg_gray


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + payload)


def _visual_sample_entry(fourcc: bytes, w: int, h: int, name: bytes,
                         ext: bytes = b"") -> bytes:
    """86-byte VisualSampleEntry (14496-12 §12.1.3) + extension boxes."""
    body = (fourcc
            + struct.pack(">6xH", 1)          # data_reference_index
            + struct.pack(">HH12x", 0, 0)     # pre_defined/reserved
            + struct.pack(">HH", w, h)
            + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
            + bytes([len(name)]) + name + b"\x00" * (31 - len(name))
            + struct.pack(">Hh", 24, -1)
            + ext)
    return struct.pack(">I", len(body) + 4) + body


def _mux(samples: list[bytes], w: int, h: int, fps: int,
         stsd_entry: bytes) -> bytes:
    """Assemble ftyp + mdat + moov around ready-made samples (one chunk)."""
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2" + b"mp41")
    mdat = _box(b"mdat", b"".join(samples))
    first_off = len(ftyp) + 8  # absolute offset of sample 1 inside mdat

    timescale, dur = max(1, fps), n  # 1 tick per frame
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, dur)
        + struct.pack(">iHH8x", 0x00010000, 0x0100, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 3, struct.pack(
        ">IIIII", 0, 0, 1, 0, dur)
        + struct.pack(">16x")  # reserved[2] + layer/alt_group/volume/reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))  # language 'und'
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">4x") + b"vide"
                 + struct.pack(">12x") + b"video\x00")

    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _norm_frames(frames: np.ndarray) -> np.ndarray:
    f = np.asarray(frames)
    if f.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    if f.dtype != np.uint8:
        f = np.clip(np.round(f.astype(np.float64) * 255.0), 0, 255) \
            .astype(np.uint8)
    return f


def encode_mp4_mjpeg(frames: np.ndarray, fps: int = 10,
                     quality: int = 90) -> bytes:
    """(n, h, w) uint8 (or float in [0,1]) -> MP4 bytes ('jpeg' samples)."""
    f = _norm_frames(frames)
    n, h, w = f.shape
    samples = [encode_jpeg_gray(f[i], quality=quality) for i in range(n)]
    entry = _visual_sample_entry(b"jpeg", w, h, b"photo-jpeg")
    return _mux(samples, w, h, fps, entry)


def encode_mp4_h264(frames: np.ndarray, fps: int = 10,
                    qp: int | None = None,
                    mb_mode: str = "i16x16") -> bytes:
    """(n, h, w) -> MP4 bytes: 'avc1' track of IDR samples.

    qp=None: all-I_PCM macroblocks — lossless except PCM's 0 -> 1 clamp.
    qp=int:  CAVLC-coded intra macroblocks (real entropy coding,
             transform + quantization; PSNR set by qp — >= 40 dB holds
             through qp ~= 20 on smooth tiles). mb_mode picks Intra_16x16
             ('i16x16') or I_NxN per-4x4 intra ('i4x4', all nine §8.3.1.2
             prediction modes).
    SPS/PPS ride in the avcC record (14496-15 §5.3.3); each sample is one
    4-byte-length-prefixed IDR NAL.
    """
    from lidartree_spark.h264 import encode_h264_cavlc

    f = _norm_frames(frames)
    n, h, w = f.shape
    sps, pps, slices = (encode_h264_ipcm(f) if qp is None
                        else encode_h264_cavlc(f, qp=qp, mb_mode=mb_mode))
    avcc_body = (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
                 + struct.pack(">H", len(sps)) + sps
                 + bytes([1]) + struct.pack(">H", len(pps)) + pps)
    entry = _visual_sample_entry(b"avc1", w, h,
                                 b"h264-ipcm" if qp is None else b"h264-cavlc",
                                 ext=_box(b"avcC", avcc_body))
    samples = [struct.pack(">I", len(s)) + s for s in slices]
    return _mux(samples, w, h, fps, entry)


def _walk(buf: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_end) for each box in [start, end)."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        tag = buf[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            body = off + 16
        elif size == 0:  # to end of file
            size = end - off
        if size < 8 or off + size > end:
            raise ValueError("corrupt MP4 box tree")
        yield tag, body, off + size
        off += size


def _find(buf: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int]:
    tag0, rest = path[0], path[1:]
    for tag, b, e in _walk(buf, start, end):
        if tag == tag0:
            return (b, e) if not rest else _find(buf, b, e, rest)
    raise ValueError(f"missing box {b'/'.join(path).decode()}")


def _video_stbl(buf: bytes) -> tuple[int, int]:
    """stbl extent of the first trak whose hdlr handler_type is 'vide' —
    NOT simply the first trak: real files often list an audio ('soun')
    track first and a handler-blind pick would misreport its codec."""
    video_fourccs = (b"jpeg", b"mjpa", b"MJPG", b"mjpg", b"avc1", b"hvc1",
                     b"hev1", b"vp09", b"av01", b"mp4v")
    moov_b, moov_e = _find(buf, 0, len(buf), [b"moov"])
    for tag, b, e in _walk(buf, moov_b, moov_e):
        if tag != b"trak":
            continue
        try:
            mdia_b, mdia_e = _find(buf, b, e, [b"mdia"])
            stbl = _find(buf, mdia_b, mdia_e, [b"minf", b"stbl"])
        except ValueError:
            continue
        try:
            hdlr_b, _ = _find(buf, mdia_b, mdia_e, [b"hdlr"])
            if buf[hdlr_b + 8:hdlr_b + 12] == b"vide":
                return stbl
        except ValueError:
            # no hdlr (minimal files): accept if stsd holds a video fourcc
            try:
                stsd_b, _ = _find(buf, stbl[0], stbl[1], [b"stsd"])
                if buf[stsd_b + 12:stsd_b + 16] in video_fourccs:
                    return stbl
            except ValueError:
                pass
    raise ValueError("no video ('vide' handler) track in MP4")


def _sample_ranges(buf: bytes, boxes: dict) -> list[tuple[int, int]]:
    """stsz/stsc/stco|co64 -> absolute (offset, size) per sample."""
    b, _ = boxes[b"stsz"]
    fixed, count = struct.unpack_from(">II", buf, b + 4)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", buf, b + 12))

    if b"stco" in boxes:
        b, _ = boxes[b"stco"]
        n_chunks = struct.unpack_from(">I", buf, b + 4)[0]
        offsets = list(struct.unpack_from(f">{n_chunks}I", buf, b + 8))
    else:  # co64: 64-bit chunk offsets (files > 4 GiB)
        b, _ = boxes[b"co64"]
        n_chunks = struct.unpack_from(">I", buf, b + 4)[0]
        offsets = list(struct.unpack_from(f">{n_chunks}Q", buf, b + 8))

    b, _ = boxes[b"stsc"]
    n_ent = struct.unpack_from(">I", buf, b + 4)[0]
    stsc = [struct.unpack_from(">III", buf, b + 8 + 12 * i)
            for i in range(n_ent)]  # (first_chunk, samples_per_chunk, _)

    # expand (chunk -> samples_per_chunk) runs into per-sample offsets
    ranges, si = [], 0
    for ci, chunk_off in enumerate(offsets, start=1):
        spc = 0
        for first, per, _ in stsc:
            if first <= ci:
                spc = per
        pos = chunk_off
        for _ in range(spc):
            if si >= count:
                break
            ranges.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != count:
        raise ValueError(f"sample table claims {count} samples, "
                         f"chunk map yields {si}")
    return ranges


def _parse_avcc(buf: bytes, entry_b: int, entry_e: int):
    """avcC record inside the avc1 sample entry -> (sps, pps, length_size)."""
    ext_start = entry_b + 86  # fixed VisualSampleEntry extent
    for tag, b, e in _walk(buf, ext_start, entry_e):
        if tag != b"avcC":
            continue
        if buf[b] != 1:
            raise ValueError("unknown avcC configurationVersion")
        length_size = (buf[b + 4] & 3) + 1
        n_sps = buf[b + 5] & 0x1F
        off = b + 6
        sps = None
        for _ in range(n_sps):
            ln = struct.unpack_from(">H", buf, off)[0]
            sps = sps or buf[off + 2:off + 2 + ln]
            off += 2 + ln
        n_pps = buf[off]
        off += 1
        pps = None
        for _ in range(n_pps):
            ln = struct.unpack_from(">H", buf, off)[0]
            pps = pps or buf[off + 2:off + 2 + ln]
            off += 2 + ln
        if sps is None or pps is None:
            raise ValueError("avcC carries no SPS/PPS")
        return sps, pps, length_size
    raise ValueError("avc1 sample entry without avcC record")


def decode_mp4(buf: bytes) -> np.ndarray:
    """MP4 bytes -> (n, h, w) uint8. First VIDEO track ('vide' handler);
    'jpeg' (Motion-JPEG) and 'avc1' (H.264 I_PCM subset) samples; 32-bit
    stco and 64-bit co64 chunk offsets."""
    stbl_b, stbl_e = _video_stbl(buf)
    boxes = {tag: (b, e) for tag, b, e in _walk(buf, stbl_b, stbl_e)}
    for need in (b"stsd", b"stsz", b"stsc"):
        if need not in boxes:
            raise ValueError(f"missing box {need.decode()}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("missing box stco/co64")

    b, _ = boxes[b"stsd"]
    entry_b = b + 8  # past version/flags + entry_count
    entry_size = struct.unpack_from(">I", buf, entry_b)[0]
    fourcc = buf[entry_b + 4:entry_b + 8]
    ranges = _sample_ranges(buf, boxes)

    if fourcc in (b"jpeg", b"mjpa", b"MJPG", b"mjpg"):
        return np.stack([decode_jpeg_gray(buf[o:o + s]) for o, s in ranges])
    if fourcc == b"avc1":
        sps, pps, length_size = _parse_avcc(buf, entry_b,
                                            entry_b + entry_size)
        nals = []
        for o, s in ranges:
            nals.extend(split_length_prefixed(buf[o:o + s], length_size))
        return decode_h264_ipcm(sps, pps, nals)
    raise NotImplementedError(
        f"mp4 codec {fourcc!r} not supported (Motion-JPEG and the H.264 "
        "I_PCM + CAVLC-Intra_16x16 subsets decode; CABAC, I_NxN and HEVC "
        "are out of scope)")


# kept name: the Motion-JPEG-era public API, now codec-dispatching
decode_mp4_mjpeg = decode_mp4
