"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from lidartree_spark.queries import (
        TABLES,
        oracle_sql_extended as oracle_sql,
        queries,
    )
    from lidartree_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in os_:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            dres = con.execute(os_[name])
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
        except Exception as e:
            failures.append((name, f"DUCK ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            failures.append((name, f"schema {scols} vs {dcols}"))
            print(f"FAIL {name}: schema {scols} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        # order-insensitive value comparison, columns sorted by name
        order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
        sset = sorted("|".join(norm(r[i]) for i in order) for r in srows)
        dset = sorted("|".join(norm(r[i]) for i in order) for r in drows)
        if sset != dset:
            bad = next((a, b) for a, b in zip(sset, dset) if a != b)
            failures.append((name, f"values differ, e.g. {bad[0]!r} vs {bad[1]!r}"))
            print(f"FAIL {name}: values differ e.g.\n  spark {bad[0]}\n  duck  {bad[1]}")
            continue
        print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
