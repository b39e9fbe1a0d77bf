"""Integer-DCT perceptual hash: kernel exactness, invariances, operator
parity over real codec paths, and banded-LSH pairing completeness."""

import numpy as np
import pytest

from lidartree_spark.kernels.phash import (DCT8_INT, int_dct2_8x8, phash64,
                                           phash64_batch)


def _phash_reference(pix):
    """Independent scalar re-derivation: explicit 4-deep loops, sorted()
    median — no einsum, no partition."""
    p = np.asarray(pix, dtype=object)  # python ints: no overflow by design
    C = [[sum(int(DCT8_INT[u, yy]) * int(p[yy, xx]) * int(DCT8_INT[v, xx])
              for yy in range(8) for xx in range(8))
          for v in range(8)] for u in range(8)]
    ac = [C[u][v] for u in range(8) for v in range(8)][1:]
    med = sorted(ac)[31]
    return sum(1 << i for i, c in enumerate(ac) if c > med)


def _rng_blocks(n, lo=0, hi=4000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=(n, 8, 8)).astype(np.int64)


def test_phash_matches_reference_loops():
    for blk in _rng_blocks(16):
        assert phash64(blk) == _phash_reference(blk)


def test_phash_batch_equals_scalar():
    blocks = _rng_blocks(32, seed=11)
    batch = phash64_batch(blocks)
    assert list(batch) == [phash64(b) for b in blocks]


def test_phash_is_63_bits_nonnegative():
    for h in phash64_batch(_rng_blocks(32, seed=13)):
        assert 0 <= h < (1 << 63)


def test_phash_brightness_invariant():
    # every u>0 basis row of DCT8_INT sums to 0, so a constant offset moves
    # only the DC coefficient — the hash must not change.
    assert all(DCT8_INT[u].sum() == 0 for u in range(1, 8))
    for blk in _rng_blocks(8, seed=17):
        assert phash64(blk) == phash64(blk + 123)


def test_phash_contrast_invariant():
    # scaling pixels by k>0 scales coeffs AND the median by k: bits fixed.
    for blk in _rng_blocks(8, seed=19):
        assert phash64(blk) == phash64(blk * 7)


def test_int_dct_shape_guard():
    with pytest.raises(ValueError):
        int_dct2_8x8(np.zeros((4, 4)))
    with pytest.raises(ValueError):
        phash64_batch(np.zeros((3, 4, 4)))


def test_image_phash_operator_matches_kernel(spark):
    """image_phash over REAL png/jpeg/raw_f32 decode paths == the kernel
    applied to the decoded + resized + quantized pixels."""
    from lidartree_spark.operators.multimodal import (decode_image_array,
                                                      image_phash,
                                                      resize_bilinear,
                                                      synthetic_media)
    media = synthetic_media(spark, n=12).where("kind = 'image'")
    got = {r.media_id: r.phash for r in image_phash(media).collect()}
    assert got
    for rec in media.collect():
        img = decode_image_array(rec)[..., 0]
        if img.shape != (8, 8):
            img = resize_bilinear(img[..., None], 8, 8)[..., 0]
        pix = np.round(img.astype(np.float64) * 256).astype(np.int64)
        assert got[rec.media_id] == phash64(pix), rec.media_id


def test_phash_neardup_pairs_complete_vs_bruteforce(spark):
    """The band join must find EVERY pair at Hamming <= 7 (pigeonhole) and
    nothing above the threshold."""
    import pandas as pd

    from lidartree_spark.operators.multimodal import phash_neardup_pairs
    rng = np.random.default_rng(23)
    base = rng.integers(0, 1 << 62, size=20, dtype=np.int64)
    rows = []
    for i, h in enumerate(base):
        rows.append((f"{2 * i:03d}", int(h)))
        flips = rng.choice(63, size=int(rng.integers(0, 10)), replace=False)
        h2 = int(h)
        for f in flips:
            h2 ^= 1 << int(f)
        rows.append((f"{2 * i + 1:03d}", h2))
    hashes = spark.createDataFrame(pd.DataFrame(rows,
                                                columns=["media_id",
                                                         "phash"]))
    got = {(r.media_a, r.media_b, r.hamming)
           for r in phash_neardup_pairs(hashes, max_hamming=7).collect()}
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = bin(rows[i][1] ^ rows[j][1]).count("1")
            if d <= 7:
                want.add((rows[i][0], rows[j][0], d))
    assert got == want


def test_phash_neardup_pairs_threshold_guard(spark):
    import pandas as pd

    from lidartree_spark.operators.multimodal import phash_neardup_pairs
    hashes = spark.createDataFrame(
        pd.DataFrame([("a", 1)], columns=["media_id", "phash"]))
    with pytest.raises(ValueError):
        phash_neardup_pairs(hashes, max_hamming=8, n_bands=8)
