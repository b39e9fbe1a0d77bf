"""H.264 I_NxN (Intra_4x4, mb_type 0) CAVLC: Table 9-4 structure, §8.3.1.2
prediction formulas against hand computations, encode/decode round-trips
across qp and content, mode coverage, and MP4 integration."""

import numpy as np
import pytest

import lidartree_spark.h264 as H


def test_cbp_table_is_bijection_with_known_anchors():
    assert sorted(H.CBP_INTRA_FROM_CODE) == list(range(48))
    # the universally-quoted anchors of Table 9-4's Intra_4x4 column
    assert H.CBP_INTRA_FROM_CODE[0] == 47
    assert H.CBP_INTRA_FROM_CODE[1] == 31
    assert H.CBP_INTRA_FROM_CODE[2] == 15
    assert H.CBP_INTRA_FROM_CODE[3] == 0
    assert H.CODE_FROM_CBP_INTRA[15] == 2


T8 = np.array([10, 20, 30, 40, 50, 60, 70, 80], np.int64)
L4 = np.array([15, 25, 35, 45], np.int64)
X = 5


def test_intra4_vertical_horizontal_dc():
    v = H._intra4_pred(0, T8, L4, X)
    assert (v == np.tile(T8[:4], (4, 1))).all()
    h = H._intra4_pred(1, T8, L4, X)
    assert (h == np.tile(L4[:, None], (1, 4))).all()
    dc = H._intra4_pred(2, T8, L4, X)
    assert (dc == (int(T8[:4].sum()) + int(L4.sum()) + 4) >> 3).all()
    assert (H._intra4_pred(2, None, None, None) == 128).all()
    assert H._intra4_pred(0, None, L4, X) is None
    assert H._intra4_pred(4, T8, L4, None) is None


def test_intra4_ddl_hand_values():
    p = H._intra4_pred(3, T8, L4, X)
    assert p[0, 0] == (10 + 2 * 20 + 30 + 2) >> 2
    assert p[1, 2] == (T8[3] + 2 * T8[4] + T8[5] + 2) >> 2
    assert p[3, 3] == (T8[6] + 3 * T8[7] + 2) >> 2


def test_intra4_ddr_hand_values():
    p = H._intra4_pred(4, T8, L4, X)
    assert p[0, 0] == (10 + 2 * X + 15 + 2) >> 2          # diagonal
    assert p[0, 1] == (X + 2 * 10 + 20 + 2) >> 2          # x-y = 1
    assert p[1, 0] == (X + 2 * 15 + 25 + 2) >> 2          # y-x = 1: corner
    assert p[2, 0] == (L4[0] + 2 * L4[1] + L4[2] + 2) >> 2
    assert p[3, 1] == (L4[0] + 2 * L4[1] + L4[2] + 2) >> 2


def test_intra4_hu_hand_values():
    p = H._intra4_pred(8, T8, L4, X)
    assert p[0, 0] == (15 + 25 + 1) >> 1                  # zHU 0
    assert p[2, 1] == (L4[2] + 3 * L4[3] + 2) >> 2        # zHU 5
    assert p[3, 0] == L4[3]                               # zHU 6 > 5
    assert p[3, 3] == L4[3]                               # zHU > 5


@pytest.mark.parametrize("qp", [0, 8, 18])
@pytest.mark.parametrize("content", ["smooth", "noise", "directional"])
def test_i4x4_roundtrip_psnr(qp, content):
    n, h, w = 2, 32, 48
    if content == "smooth":
        t, y, x = np.mgrid[0:n, 0:h, 0:w]
        f = (40 + 3 * t + 4 * y + 5 * x).astype(np.uint8)
    elif content == "noise":
        f = np.random.default_rng(7).integers(0, 256, (n, h, w)) \
            .astype(np.uint8)
    else:  # strong diagonal structure exercises the angular modes
        t, y, x = np.mgrid[0:n, 0:h, 0:w]
        f = (((x + y) % 7) * 36).astype(np.uint8)
    sps, pps, sl = H.encode_h264_cavlc(f, qp=qp, mb_mode="i4x4")
    dec = H.decode_h264_ipcm(sps, pps, sl)[:, :h, :w]
    err = dec.astype(np.float64) - f.astype(np.float64)
    mse = float((err ** 2).mean())
    psnr = np.inf if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    assert psnr >= 40.0, (content, qp, psnr)


def test_i4x4_encoder_uses_many_prediction_modes(monkeypatch):
    """The decoder calls _intra4_pred once per block with the CHOSEN mode;
    spying on it during decode proves the encoder's SAE search actually
    selects a diverse mode set (not just DC)."""
    f = np.random.default_rng(5).integers(0, 256, (2, 48, 64)) \
        .astype(np.uint8)
    sps, pps, sl = H.encode_h264_cavlc(f, qp=6, mb_mode="i4x4")
    seen = set()
    orig = H._intra4_pred

    def spy(mode, top, le, corner):
        seen.add(mode)
        return orig(mode, top, le, corner)

    monkeypatch.setattr(H, "_intra4_pred", spy)
    H.decode_h264_ipcm(sps, pps, sl)
    assert seen == set(range(9)), sorted(seen)


def test_i4x4_and_i16x16_slices_mix_in_one_stream():
    t, y, x = np.mgrid[0:1, 0:32, 0:32]
    f = (30 + 5 * y + 2 * x).astype(np.uint8)
    _, _, s4 = H.encode_h264_cavlc(f, qp=6, mb_mode="i4x4")
    sps, pps, s16 = H.encode_h264_cavlc(f, qp=6, mb_mode="i16x16")
    dec = H.decode_h264_ipcm(sps, pps, [s4[0], s16[0]])
    assert dec.shape[0] == 2
    for fr in dec:
        err = fr[:32, :32].astype(np.float64) - f[0]
        assert 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-9)) \
            >= 40.0


def test_mp4_i4x4_integration():
    from lidartree_spark.mp4 import decode_mp4, encode_mp4_h264
    t, y, x = np.mgrid[0:3, 0:24, 0:40]
    f = ((40 + 3 * t + 4 * y + 5 * x) % 256).astype(np.uint8)
    blob = encode_mp4_h264(f, qp=8, mb_mode="i4x4")
    dec = decode_mp4(blob)
    assert dec.shape == f.shape
    err = dec.astype(np.float64) - f.astype(np.float64)
    assert 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-9)) >= 40.0
