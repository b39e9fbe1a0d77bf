"""Invariants for the sketch family (HyperLogLog + Count-Min); cross-engine
parity is in tests/test_extended_oracles.py."""

from collections import defaultdict

from lidartree_spark.queries import queries

SF = "/root/testdata/sf0.001"


def test_sketch_properties(spark):
    rows = defaultdict(list)
    for r in queries()["sketches"](spark, SF).collect():
        rows[r["section"]].append(r)
    # HLL: estimate within the m=64 error regime of the exact count
    for r in rows["est"]:
        exact, est = r["k"], r["val"]
        assert abs(est - exact) / exact < 0.25, (r["key"], exact, est)
    # registers: 64 per language, all within the 48-bit rho domain
    per_lang = defaultdict(list)
    for r in rows["reg"]:
        per_lang[r["key"]].append(r["val"])
    for lang, regs in per_lang.items():
        assert len(regs) == 64
        assert all(0 <= v <= 49 for v in regs)
    # Count-Min: the estimate NEVER undercounts (the CM guarantee) and the
    # cell table conserves total mass per row
    for r in rows["hh"]:
        assert r["val"] >= r["k"], (r["key"], r["k"], r["val"])
    mass = defaultdict(int)
    for r in rows["cms"]:
        mass[int(r["k"]) // 64] += int(r["val"])
    assert mass[0] == mass[1]  # both hash rows saw every token once
