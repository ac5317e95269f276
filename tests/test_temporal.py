"""As-of and range join semantics against hand-computed fixtures.

The oracle gate (q_events_attribution / q_events_error_context vs DuckDB
ASOF JOIN / inequality join) covers the bulk; these pin the edge cases —
equal timestamps, no-prior-row NULLs, tolerance boundaries, and bucket
crossings — on constructed data.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(20)), (3, _ts(5))],
        "event_id long, ts timestamp",
    ).withColumn("user_id", F.lit(7))
    right = spark.createDataFrame(
        [(100, _ts(8)), (101, _ts(10)), (102, _ts(15))],
        "click_id long, ts timestamp",
    ).withColumn("user_id", F.lit(7))
    out = {
        r["event_id"]: r["click_id_right"]
        for r in asof_join(
            left, right, on="user_id", right_value_cols=("click_id",)
        ).collect()
    }
    assert out[1] == 101  # equal timestamp IS visible (inclusive)
    assert out[2] == 102  # latest before 20 is 15
    assert out[3] is None  # nothing at or before 5


def test_asof_respects_key_partition(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10)), (2, 8, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 7, _ts(9))], "click_id long, user_id long, ts timestamp"
    )
    out = {
        r["event_id"]: r["click_id_right"]
        for r in asof_join(
            left, right, on="user_id", right_value_cols=("click_id",)
        ).collect()
    }
    assert out[1] == 100
    assert out[2] is None  # other user's click never leaks


def test_range_join_tolerance_boundary(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 7, _ts(20)),  # exactly -10s: included (closed interval)
            (11, 7, _ts(41)),  # +11s: out
            (12, 7, _ts(25)),  # in
            (13, 9, _ts(30)),  # other key: out
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = sorted(
        r["r_event_id"]
        for r in range_join(
            left, right, on="user_id", tolerance_us=10_000_000
        ).collect()
    )
    assert got == [10, 12]


def test_range_join_crosses_bucket_boundary(spark):
    # tolerance 10s → buckets are 10s wide; pair straddles a boundary
    left = spark.createDataFrame(
        [(1, 7, _ts(19))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 7, _ts(21))], "event_id long, user_id long, ts timestamp"
    )
    got = range_join(
        left, right, on="user_id", tolerance_us=10_000_000
    ).collect()
    assert len(got) == 1 and got[0]["r_event_id"] == 10


def test_range_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(0)), (2, 7, _ts(50))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 7, _ts(52))], "event_id long, user_id long, ts timestamp"
    )
    rows = range_join(
        left, right, on="user_id", tolerance_us=5_000_000, how="left"
    ).collect()
    by_left = {r["l_event_id"]: r["r_event_id"] for r in rows}
    assert by_left[2] == 10
    assert by_left[1] is None  # unmatched left row survives with NULLs
