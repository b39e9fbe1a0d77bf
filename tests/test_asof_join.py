"""Merge as-of join: hand-pinned semantics (ties, left-join NULLs,
determinism). The events-table gate parity vs DuckDB's NATIVE ASOF JOIN
is covered by tests/test_extended_oracles.py."""

import datetime as dt

from lidartree_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_hand_case(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)),   # matches r2 (ts 3)
         (2, 10, _ts(3)),   # equal ts -> <= semantics matches r2 itself
         (3, 10, _ts(1)),   # before any right row -> NULL
         (4, 20, _ts(9))],  # other key, matches r3
        "lid long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(101, 10, _ts(2)), (102, 10, _ts(3)), (103, 20, _ts(9))],
        "rid long, user_id long, rts timestamp")
    out = {r["lid"]: r for r in
           asof_join(left, right, "user_id", "ts", "rts", "rid").collect()}
    assert out[1]["rid"] == 102 and out[1]["rts"] == _ts(3)
    assert out[2]["rid"] == 102          # <= includes the equal timestamp
    assert out[3]["rid"] is None and out[3]["rts"] is None
    assert out[4]["rid"] == 103
    # left columns preserved verbatim
    assert all(out[k]["ts"] == t for k, t in
               [(1, _ts(5)), (2, _ts(3)), (3, _ts(1)), (4, _ts(9))])


def test_asof_tie_on_same_right_timestamp(spark):
    """Two right rows at the SAME (key, time): the greatest right_id wins —
    deterministic, matching the documented tie rule."""
    left = spark.createDataFrame([(1, 10, _ts(5))],
                                 "lid long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(101, 10, _ts(4)), (102, 10, _ts(4))],
        "rid long, user_id long, rts timestamp")
    (row,) = asof_join(left, right, "user_id", "ts", "rts", "rid").collect()
    assert row["rid"] == 102


def test_asof_null_times(spark):
    """NULL-timed RIGHT rows never become matchable state; NULL-timed
    LEFT rows survive the left join unmatched (NULL right columns) —
    standard never-true-inequality semantics."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, None)],
        "lid long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(101, 10, None), (102, 10, _ts(2))],
        "rid long, user_id long, rts timestamp")
    rows = {r["lid"]: r for r in
            asof_join(left, right, "user_id", "ts", "rts", "rid").collect()}
    assert sorted(rows) == [1, 2]
    assert rows[1]["rid"] == 102  # the NULL-timed right row never matches
    assert rows[2]["rid"] is None and rows[2]["rts"] is None
    assert rows[2]["ts"] is None  # left columns preserved verbatim
