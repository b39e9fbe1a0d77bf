"""augment_images: exactness of each index/value transform through the
PNG re-encode, and the group algebra of the dihedral ops."""

import numpy as np
import pandas as pd


def _media(spark, arrs):
    from lidartree_spark.codecs import encode_png_gray16
    rows = [{"media_id": f"{i:02d}", "bytes": encode_png_gray16(a / 256.0),
             "fmt": "png", "width": a.shape[1], "height": a.shape[0]}
            for i, a in enumerate(arrs)]
    return spark.createDataFrame(
        pd.DataFrame(rows), schema=("media_id string, bytes binary, "
                                    "fmt string, width int, height int"))


def _decode_all(rows):
    from lidartree_spark.codecs import decode_png_gray16
    return {(r.media_id, r.op):
            np.round(decode_png_gray16(r.bytes).astype(np.float64)
                     * 256).astype(np.int64) for r in rows}


def test_augment_ops_match_numpy(spark):
    from lidartree_spark.operators.multimodal import augment_images
    rng = np.random.default_rng(5)
    arrs = [rng.integers(0, 300, size=(5, 7)).astype(np.int64),
            rng.integers(0, 300, size=(8, 6)).astype(np.int64)]
    got = _decode_all(augment_images(_media(spark, arrs)).collect())
    for i, a in enumerate(arrs):
        mid = f"{i:02d}"
        h, w = a.shape
        ch, cw = h // 2, w // 2
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        want = {
            "identity": a,
            "flip_h": a[:, ::-1],
            "flip_v": a[::-1, :],
            "rot90": np.rot90(a, 1),
            "rot180": np.rot90(a, 2),
            "rot270": np.rot90(a, 3),
            "crop_center": a[y0:y0 + ch, x0:x0 + cw],
            "brighten": a + 4096,  # +16.0 decoded units on the 1/256 grid
        }
        for op, exp in want.items():
            np.testing.assert_array_equal(got[(mid, op)], exp, err_msg=op)


def test_augment_dihedral_group_identities(spark):
    """rot90 o rot270 = identity, flip_h o flip_h = identity,
    rot180 = flip_h o flip_v — verified through TWO encode/decode
    round-trips by feeding augmented outputs back in as media."""
    from lidartree_spark.operators.multimodal import augment_images
    rng = np.random.default_rng(9)
    a = rng.integers(0, 300, size=(6, 9)).astype(np.int64)
    first = augment_images(_media(spark, [a]),
                           ops=("rot90", "flip_h", "flip_v"))
    rows = first.collect()
    by_op = {r.op: r for r in rows}
    second_in = spark.createDataFrame(pd.DataFrame(
        [{"media_id": r.op, "bytes": r.bytes, "fmt": "png",
          "width": r.width, "height": r.height} for r in rows]),
        schema="media_id string, bytes binary, fmt string, width int, "
               "height int")
    second = _decode_all(
        augment_images(second_in, ops=("rot270", "flip_h", "flip_v"))
        .collect())
    np.testing.assert_array_equal(second[("rot90", "rot270")], a)
    np.testing.assert_array_equal(second[("flip_h", "flip_h")], a)
    np.testing.assert_array_equal(second[("flip_v", "flip_v")], a)
    # rot180 = flip_v applied to flip_h's output
    np.testing.assert_array_equal(second[("flip_h", "flip_v")],
                                  np.rot90(a, 2))
    assert by_op["rot90"].height == 9 and by_op["rot90"].width == 6
