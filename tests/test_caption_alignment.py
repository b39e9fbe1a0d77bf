"""Invariants for the cross-modal caption<->image alignment filter.
Spark<->DuckDB parity is covered by tests/test_extended_oracles.py."""

from lidartree_spark.queries import queries

SF = "/root/testdata/sf0.001"


def test_filter_acts_both_ways(spark):
    rows = queries()["caption_alignment"](spark, SF).collect()
    assert len(rows) == 24
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert len(kept) == 12 and len(dropped) == 12
    # aligned pairs: the parsed claim equals the decoded maximum EXACTLY
    # (integer spike through the real PNG16 round-trip)
    for r in kept:
        assert r["align_diff"] == 0.0
        assert r["claimed_peak"] == r["px_max"]
    # misaligned pairs carry the partner's caption: off by >= 5 m
    for r in dropped:
        assert r["align_diff"] >= 5.0


def test_pixel_stats_through_real_codec(spark):
    rows = {r["media_id"]: r for r in
            queries()["caption_alignment"](spark, SF).collect()}
    # tile t: spike 20+t dominates the dyadic base field (max 11.25)
    for t in range(24):
        r = rows[f"img{t:04d}"]
        assert r["px_max"] == 20.0 + t
        assert r["n_px"] == 256
        # closed-form mean: (base sum - overwritten cell + spike) / 256
        rr, cc = t % 16, (3 * t + 1) % 16
        assert r["px_mean"] == (1440.0 - (rr + 2 * cc) * 0.25 + 20 + t) / 256
