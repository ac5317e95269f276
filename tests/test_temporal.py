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


def test_asof_matches_bruteforce_random(spark):
    """Randomized corpus vs a python merge_asof oracle."""
    import random

    rng = random.Random(7)
    lefts = [
        (i, rng.randint(0, 4), _ts(rng.randint(0, 59)))
        for i in range(60)
    ]
    rights = [
        (100 + i, rng.randint(0, 4), _ts(rng.randint(0, 59)))
        for i in range(40)
    ]
    left = spark.createDataFrame(
        lefts, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rights],
        "click_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["click_id_right"]
        for r in asof_join(
            left, right, on="user_id", right_value_cols=("click_id",)
        ).collect()
    }
    for eid, key, ts in lefts:
        prior = [r for r in rights if r[1] == key and r[2] <= ts]
        # ties on (key, ts) among rights: the operator takes the window's
        # last row; pin the oracle the same way via (ts, click_id) max
        want = max(prior, key=lambda r: (r[2], r[0]))[0] if prior else None
        if want is not None and got[eid] != want:
            # equal-ts duplicates are ambiguous in both engines; accept
            # any right row at the same (key, max ts)
            best_ts = max(r[2] for r in prior)
            assert got[eid] in {
                r[0] for r in prior if r[2] == best_ts
            }, (eid, got[eid], want)
        else:
            assert got[eid] == want


def test_range_join_matches_bruteforce_random(spark):
    import random

    rng = random.Random(11)
    lefts = [(i, rng.randint(0, 3), _ts(rng.randint(0, 59))) for i in range(40)]
    rights = [
        (100 + i, rng.randint(0, 3), _ts(rng.randint(0, 59)))
        for i in range(40)
    ]
    tol_s = 7
    left = spark.createDataFrame(
        lefts, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        rights, "event_id long, user_id long, ts timestamp"
    )
    got = sorted(
        (r["l_event_id"], r["r_event_id"])
        for r in range_join(
            left, right, on="user_id", tolerance_us=tol_s * 1_000_000
        ).collect()
    )
    want = sorted(
        (l[0], r[0])
        for l in lefts
        for r in rights
        if l[1] == r[1] and abs((l[2] - r[2]).total_seconds()) <= tol_s
    )
    assert got == want


def test_funnel_ordering_constraint(spark):
    """A stage only counts at-or-after the previous stage's earliest
    qualifying time; keys missing stage 1 are absent entirely."""
    from bigdataminingproject_spark.operators.events import funnel_stages

    rows = [
        # user 1: clean in-order funnel
        (1, "signup", _ts(10)), (1, "click", _ts(20)), (1, "purchase", _ts(30)),
        # user 2: purchase BEFORE any click-after-signup -> stage_3 NULL
        (2, "signup", _ts(10)), (2, "purchase", _ts(15)), (2, "click", _ts(20)),
        # user 3: click before signup doesn't count; later click does
        (3, "click", _ts(5)), (3, "signup", _ts(10)), (3, "click", _ts(12)),
        # user 4: no signup -> absent from output
        (4, "click", _ts(1)), (4, "purchase", _ts(2)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {r["user_id"]: r for r in funnel_stages(ev).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["stage_3_us"] is not None
    assert out[2]["stage_2_us"] is not None and out[2]["stage_3_us"] is None
    us = lambda s: int(_ts(s).timestamp() * 1_000_000)  # noqa: E731
    assert out[3]["stage_2_us"] == us(12)  # pre-signup click ignored


def test_anomalous_windows_flags_exact_outlier(spark):
    """Integer z-test: one 10x bucket among nine flat ones is >2-sigma;
    the flat ones are not. Hand-checked integers: n=10, sx=190,
    sxx=10900; x=100 gives lhs 5,904,900 > rhs 2,916,000, x=10 gives
    lhs 72,900 < rhs."""
    from bigdataminingproject_spark.operators.events import (
        anomalous_windows,
    )

    rows = [(i, 10) for i in range(9)] + [(9, 100)]
    counts = spark.createDataFrame(rows, "bucket int, x long")
    out = anomalous_windows(counts).collect()
    assert [(r["bucket"], r["x"]) for r in out] == [(9, 100)]


def test_anomalous_windows_threshold_boundary(spark):
    """A bucket sitting exactly on the z*sd boundary is NOT flagged
    (strict inequality), and the integer arithmetic makes the boundary
    deterministic: counts {8,12} with mean 10 and n=2 give lhs == 2*rhs/4
    cases that floats could wobble on."""
    from bigdataminingproject_spark.operators.events import (
        anomalous_windows,
    )

    # n=3, x values 9, 10, 11: sx=30, sxx=302. For x=11:
    # lhs=(33-30)^2*2=18; rhs=4*3*(3*302-900)=4*3*6=72 -> none flagged.
    counts = spark.createDataFrame(
        [(0, 9), (1, 10), (2, 11)], "bucket int, x long"
    )
    assert anomalous_windows(counts).count() == 0


def test_latest_by_key_compacts_changelog(spark):
    import datetime

    from bigdataminingproject_spark.operators.events import latest_by_key

    t = datetime.datetime
    rows = [
        (1, t(2024, 1, 1, 10), 7, "a", 1.0, ""),
        (2, t(2024, 1, 1, 12), 7, "b", 2.0, ""),  # latest for user 7
        (3, t(2024, 1, 1, 12), 8, "c", 3.0, ""),
        (4, t(2024, 1, 1, 12), 8, "d", 4.0, ""),  # same ts: id wins
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["user_id"]: r["event_id"] for r in latest_by_key(ev).collect()}
    assert out == {7: 2, 8: 4}


def test_rolling_daily_uses_calendar_days_not_rows(spark):
    import datetime

    from bigdataminingproject_spark.operators.events import rolling_daily

    t = datetime.datetime
    # key 'x': events on day 1, day 2, then a gap to day 10
    rows = [
        (1, t(2024, 1, 1), 1, "x", 1.0, ""),
        (2, t(2024, 1, 2), 1, "x", 1.0, ""),
        (3, t(2024, 1, 10), 1, "x", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["day"].day: r["events_7d"] for r in rolling_daily(ev).collect()}
    # day 10's trailing 7 calendar days (Jan 4-10) exclude days 1-2; a
    # ROWS frame would have counted all three observed rows
    assert out[10] == 1
    assert out[2] == 2


def test_active_users_window_dau_wau(spark):
    import datetime

    from bigdataminingproject_spark.operators.events import (
        active_users_window,
    )

    t = datetime.datetime
    rows = [
        (1, t(2024, 1, 1), 100, "a", 0.0, ""),
        (2, t(2024, 1, 1), 200, "a", 0.0, ""),
        (3, t(2024, 1, 5), 100, "a", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["day"].day: (r["dau"], r["wau"]) for r in
           active_users_window(ev, window_days=7).collect()}
    assert out[1] == (2, 2)
    assert out[5] == (1, 2)  # day-5 DAU is user 100; WAU spans both


def test_cohort_retention_triangle(spark):
    import datetime

    from bigdataminingproject_spark.operators.events import cohort_triangle

    t = datetime.datetime
    # cohort week 0: users 1,2 (Jan 1-7); user 1 returns week 1, user 2
    # never returns. cohort week 1: user 3.
    rows = [
        (1, t(2024, 1, 1), 1, "a", 0.0, ""),
        (2, t(2024, 1, 2), 2, "a", 0.0, ""),
        (3, t(2024, 1, 9), 1, "a", 0.0, ""),
        (4, t(2024, 1, 10), 3, "a", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        (r["cohort_week"], r["period_offset"]): r
        for r in cohort_triangle(ev).collect()
    }
    assert out[(0, 0)]["active_users"] == 2
    assert out[(0, 0)]["cohort_size"] == 2
    assert out[(0, 0)]["retention_rate"] == 1.0
    assert out[(0, 1)]["active_users"] == 1
    assert out[(0, 1)]["retention_rate"] == 0.5
    assert out[(1, 0)]["active_users"] == 1
    assert (1, 1) not in out


def test_cohort_retention_multiple_events_count_once(spark):
    import datetime

    from bigdataminingproject_spark.operators.events import cohort_triangle

    t = datetime.datetime
    rows = [
        (i, t(2024, 1, 1, i), 42, "a", 0.0, "") for i in range(5)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = cohort_triangle(ev).collect()
    assert len(out) == 1
    assert out[0]["active_users"] == 1


def test_funnel_latency_exact_percentiles(spark):
    import datetime

    from bigdataminingproject_spark.operators.events import funnel_latency

    t = datetime.datetime
    # users 1-4 sign up at t0; users 1-3 click at +10s/+20s/+40s;
    # user 3's click is BEFORE signup -> does not count (ordered funnel
    # takes earliest click >= signup: none for user 4).
    rows = [
        (1, t(2024, 1, 1, 0, 0, 0), 1, "signup", 0.0, ""),
        (2, t(2024, 1, 1, 0, 0, 10), 1, "click", 0.0, ""),
        (3, t(2024, 1, 1, 0, 0, 0), 2, "signup", 0.0, ""),
        (4, t(2024, 1, 1, 0, 0, 20), 2, "click", 0.0, ""),
        (5, t(2024, 1, 1, 0, 0, 0), 3, "signup", 0.0, ""),
        (6, t(2024, 1, 1, 0, 0, 40), 3, "click", 0.0, ""),
        (7, t(2024, 1, 1, 0, 0, 10), 4, "signup", 0.0, ""),
        (8, t(2024, 1, 1, 0, 0, 0), 4, "click", 0.0, ""),
        # one purchase so the second transition row exists
        (9, t(2024, 1, 1, 0, 1, 0), 1, "purchase", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["transition"]: r for r in funnel_latency(ev).collect()}
    sc = out["signup->click"]
    assert sc["n_reached"] == 4 and sc["n_converted"] == 3
    assert sc["conv_rate"] == 0.75
    # latencies {10, 20, 40}: p50 = 20, p90 = (n-1)p = 1.8 -> 20 + 0.8*20
    assert sc["p50_latency_s"] == 20.0
    assert sc["p90_latency_s"] == 36.0
    cp = out["click->purchase"]
    assert cp["n_reached"] == 3 and cp["n_converted"] == 1
    assert cp["p50_latency_s"] == 50.0


def test_scd2_collapses_runs_and_links_intervals(spark):
    import datetime

    from bigdataminingproject_spark.operators.events import scd2_history

    t = datetime.datetime
    rows = [
        (1, t(2024, 1, 1), 7, "a", 0.0, ""),
        (2, t(2024, 1, 2), 7, "a", 0.0, ""),   # same state -> same run
        (3, t(2024, 1, 3), 7, "b", 0.0, ""),   # change
        (4, t(2024, 1, 4), 7, "a", 0.0, ""),   # change back (new run)
        (5, t(2024, 1, 1), 8, "x", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = [
        (r["user_id"], r["version"], r["state"], r["n_records"],
         r["valid_to_us"] is None)
        for r in scd2_history(ev).collect()
    ]
    assert out == [
        (7, 1, "a", 2, False),
        (7, 2, "b", 1, False),
        (7, 3, "a", 1, True),   # current interval: open-ended
        (8, 1, "x", 1, True),
    ]
    # intervals chain exactly: valid_to of v1 == valid_from of v2
    rows7 = scd2_history(ev).filter("user_id = 7").collect()
    assert rows7[0]["valid_to_us"] == rows7[1]["valid_from_us"]
    assert rows7[1]["valid_to_us"] == rows7[2]["valid_from_us"]


def test_incremental_rollup_merge_equals_full(spark, sf_dir):
    """Snapshot + delta merge must equal the single-pass rollup row for
    row, and an empty delta must be the identity."""
    from bigdataminingproject_spark.operators.events import (
        finish_hourly_rollup,
        hourly_rollup_partial,
        merge_hourly_rollup,
        q_events_hourly,
    )
    from bigdataminingproject_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    full = [tuple(r) for r in q_events_hourly(spark, sf_dir).collect()]
    snap = hourly_rollup_partial(ev.filter(F.col("event_id") % 3 != 0))
    merged = finish_hourly_rollup(
        merge_hourly_rollup(snap, ev.filter(F.col("event_id") % 3 == 0))
    )
    assert [tuple(r) for r in merged.collect()] == full
    ident = finish_hourly_rollup(
        merge_hourly_rollup(
            hourly_rollup_partial(ev), ev.filter("event_id < 0")
        )
    )
    assert [tuple(r) for r in ident.collect()] == full


def test_pit_join_picks_enclosing_interval(spark):
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.temporal import pit_join

    # history: user 1 is A on [10, 20), B from 20 (current)
    hist = spark.createDataFrame(
        [(1, "A", 10, 20), (1, "B", 20, None)],
        "user_id: long, state: string, valid_from_us: long, "
        "valid_to_us: long",
    )
    facts = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 19), (1, 20), (1, 99), (2, 15)],
        "user_id: long, us: long",
    )
    got = {
        (r.user_id, r.us): r.state
        for r in pit_join(facts, hist).collect()
    }
    assert got[(1, 5)] is None  # before first interval
    assert got[(1, 10)] == "A"  # inclusive start
    assert got[(1, 19)] == "A"
    assert got[(1, 20)] == "B"  # exclusive end -> next interval
    assert got[(1, 99)] == "B"  # open current interval
    assert got[(2, 15)] is None  # unknown key
    assert len(got) == 6  # exactly one row per fact


def test_pit_join_composes_with_scd2_history(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.events import scd2_history
    from bigdataminingproject_spark.operators.temporal import pit_join

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 0), 7, "browse", 0.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 0, 5), 7, "cart", 0.0, "{}"),
            (3, datetime(2024, 1, 1, 0, 0, 9), 7, "purchase", 9.5, "{}"),
        ],
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    hist = scd2_history(ev.filter(F.col("event_type") != "purchase"))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    rows = pit_join(pur, hist).collect()
    assert len(rows) == 1
    assert rows[0].state == "cart"  # the state at purchase time
