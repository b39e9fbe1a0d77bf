"""Invariants for aspect-ratio bucketed image batch packing (parity with
DuckDB is covered by tests/test_extended_oracles.py)."""

from collections import defaultdict

from lidartree_spark.queries import queries

SF = "/root/testdata/sf0.001"
B = 400_000


def test_pack_semantics(spark):
    rows = queries()["image_pack"](spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        # bucket classes are consistent with the dims
        if r["bucket"] == "tall":
            assert 4 * r["w"] <= 3 * r["h"]
        elif r["bucket"] == "wide":
            assert 4 * r["h"] <= 3 * r["w"]
        else:
            assert 4 * r["w"] > 3 * r["h"] and 4 * r["h"] > 3 * r["w"]
        assert r["px"] == r["w"] * r["h"]
        # an image STARTS inside its batch's budget (concat-split rule)
        assert 0 <= r["px_offset"] < B
        assert r["batch_id"] >= 0
    # per bucket: (batch_id * B + px_offset) is the exact running pixel sum
    # over the packing stream — concat-and-split with no gaps or overlaps
    per_bucket = defaultdict(list)
    for r in rows:
        per_bucket[r["bucket"]].append(r)
    for bucket, rs in per_bucket.items():
        rs.sort(key=lambda r: r["batch_id"] * B + r["px_offset"])
        run = 0
        for r in rs:
            assert r["batch_id"] * B + r["px_offset"] == run
            run += r["px"]
        # batches within a bucket are contiguous 0..max
        ids = {r["batch_id"] for r in rs}
        assert ids == set(range(max(ids) + 1))
