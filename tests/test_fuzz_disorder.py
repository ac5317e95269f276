"""Seeded event-time-disorder differential fuzzer (VERDICT r7 #5).

The round-7 10x gate caught ``q_stream_sessions`` silently dropping
192k of 955k sessions ONLY because the scale replica's id-ordered
replay happened to be out of event-time order — the late/duplicate/
reordered-rows-vs-watermark bug class (SURVEY W6) had no systematic
coverage. This file adds it: a seeded generator produces event streams
whose ARRIVAL order deviates from event-time order by a BOUNDED jitter
(arrival key = ts + U(-J, +J), so when a row arrives, the max event
time already seen is at most 2J ahead of it), replays them through the
three watermark-sensitive streaming shapes with watermark delay > the
disorder bound, and requires EXACT equality with a batch answer:

- W6 dedup (``q_stream_dedup``'s shape): dropDuplicatesWithinWatermark
  over (user, hour); expected = pure-Python distinct (user, hour) — an
  implementation-independent oracle.
- sessionize (``q_stream_sessions``'s shape): session_window
  aggregation; expected = pure-Python gaps-and-islands with the
  inclusive ``diff <= gap`` merge rule.
- foreachBatch maintenance (``q_stream_decay_maintenance``'s shape):
  per-batch decayed-counter partials folded through the LSM store's
  merge law; expected = the batch ``time_decay_scores`` on the same
  rows — the property pinned here is that the fold lands on the batch
  answer REGARDLESS of which disorder permutation sliced the batches.

Under bounded disorder <= watermark delay, Structured Streaming's
contract is that NO row is dropped as late — so every case must match
exactly; any divergence is a real watermark-semantics bug of the kind
round 7 hit.
"""

from __future__ import annotations

import math
import random
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.streaming.replay import file_replay_source

SEEDS = list(range(17))  # 17 seeds x 4 legs = 68 cases (>= 50, VERDICT r7 #5)


def _gen_events(seed: int):
    """Seeded disordered event stream. Returns (rows, jitter_s) where
    rows = [(arrival_pos, event_id, user_id, epoch_s)] sorted by
    arrival order, and every row's lateness vs the running max event
    time is <= 2 * jitter_s by construction."""
    rng = random.Random(10_000 + seed)
    n_users = rng.choice((4, 8, 16))
    n_events = rng.choice((200, 400))
    jitter_s = rng.choice((60, 300, 600, 900))
    base = 1_700_000_000  # fixed epoch anchor
    t = base
    rows = []
    for i in range(n_events):
        t += rng.randint(1, 900)
        rows.append((i, rng.randrange(n_users), t))
    # bounded-disorder arrival permutation
    arrival = sorted(
        rows, key=lambda r: r[2] + rng.uniform(-jitter_s, jitter_s)
    )
    return (
        [
            (pos, eid, user, ts)
            for pos, (eid, user, ts) in enumerate(arrival)
        ],
        jitter_s,
    )


def _stage(spark, rows):
    df = spark.createDataFrame(
        rows, "arrival_pos long, event_id long, user_id long, epoch_s long"
    ).withColumn("ts", F.timestamp_seconds("epoch_s"))
    staging = tempfile.mkdtemp(prefix="fuzz_disorder_")
    stream = file_replay_source(
        spark, df, staging, chunks=5, order_col="arrival_pos"
    )
    return stream, staging


@pytest.mark.parametrize("seed", SEEDS)
def test_disordered_dedup_matches_batch_distinct(spark, seed):
    rows, jitter_s = _gen_events(seed)
    # hour-bucket keys recur for up to 3600s of event time; state must
    # outlive bucket span + disorder bound
    delay_s = 3600 + 2 * jitter_s + 300
    expected = {(user, ts // 3600) for _, _, user, ts in rows}
    stream, staging = _stage(spark, rows)
    try:
        deduped = (
            stream.select(
                "user_id",
                "ts",
                (F.col("epoch_s") - F.col("epoch_s") % 3600).alias(
                    "hour_s"
                ),
            )
            .withWatermark("ts", f"{delay_s} seconds")
            .dropDuplicatesWithinWatermark(["user_id", "hour_s"])
            .select("user_id", "hour_s")
        )
        name = f"fuzz_dedup_{uuid.uuid4().hex[:10]}"
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = [
            (r["user_id"], r["hour_s"] // 3600)
            for r in spark.table(name).collect()
        ]
        spark.catalog.dropTempView(name)
        # no duplicate emission AND no missed key (raw sink content)
        assert len(got) == len(set(got)), f"seed {seed}: duplicate emitted"
        assert set(got) == expected, f"seed {seed}: dedup set mismatch"
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _py_sessions(rows, gap_s):
    """Pure-Python gaps-and-islands with the inclusive diff <= gap rule
    (session_window's merge semantics, pinned by the boundary pytest in
    test_streaming.py)."""
    by_user: dict = {}
    for _, _, user, ts in rows:
        by_user.setdefault(user, []).append(ts)
    out = set()
    for user, tss in by_user.items():
        tss.sort()
        start, last, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            if ts - last <= gap_s:
                last, n = ts, n + 1
            else:
                out.add((user, start, last, n))
                start, last, n = ts, ts, 1
        out.add((user, start, last, n))
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_disordered_sessionize_matches_batch(spark, seed):
    rows, jitter_s = _gen_events(seed)
    gap_s = 1800
    delay_s = 2 * jitter_s + 300
    expected = _py_sessions(rows, gap_s)
    stream, staging = _stage(spark, rows)
    try:
        agg = (
            stream.withWatermark("ts", f"{delay_s} seconds")
            .groupBy(
                F.session_window("ts", f"{gap_s} seconds").alias("w"),
                "user_id",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("epoch_s").alias("start_s"),
                F.max("epoch_s").alias("end_s"),
            )
        )
        name = f"fuzz_sessions_{uuid.uuid4().hex[:10]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["user_id"], r["start_s"], r["end_s"], r["n"])
            for r in spark.table(name).collect()
        }
        spark.catalog.dropTempView(name)
        assert got == expected, (
            f"seed {seed}: sessions diverged "
            f"(missing {sorted(expected - got)[:3]}, "
            f"extra {sorted(got - expected)[:3]})"
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


@pytest.mark.parametrize("seed", SEEDS)
def test_disordered_maintenance_fold_matches_batch(spark, seed):
    from bigdataminingproject_spark.operators.events import (
        decay_partials,
        finish_decay,
        fold_decay_partials,
        time_decay_scores,
    )
    from bigdataminingproject_spark.streaming.pipeline import snapshot_sink
    from bigdataminingproject_spark.streaming.statestore import (
        AppendOnlyPartsStore,
    )

    rows, _ = _gen_events(seed)
    df = spark.createDataFrame(
        rows, "arrival_pos long, event_id long, user_id long, epoch_s long"
    ).withColumn("ts", F.timestamp_seconds("epoch_s"))
    expected = {
        (r["user_id"], r["n_events"], r["decay_score"])
        for r in time_decay_scores(
            df, tau_days=1.0, id_col="event_id"
        ).collect()
    }
    stream, staging = _stage(spark, rows)
    state_root = tempfile.mkdtemp(prefix="fuzz_decay_state_")
    store = AppendOnlyPartsStore(
        spark,
        state_root,
        "fuzz_decay",
        merge_fanout=2,
        merge_transform=fold_decay_partials,
    )
    try:
        snapshot_sink(
            stream,
            lambda batch_df, bid: store.append(
                decay_partials(batch_df, tau_days=1.0)
            ),
        )
        got = {
            (r["user_id"], r["n_events"], r["decay_score"])
            for r in finish_decay(store.read(), tau_days=1.0).collect()
        }
        # exact integer counts; the 6 dp round absorbs the fold's
        # association-order difference vs the batch cumulative sum —
        # allow the documented one-ulp-at-6dp envelope on the score
        exp_by_user = {u: (n, s) for u, n, s in expected}
        got_by_user = {u: (n, s) for u, n, s in got}
        assert set(exp_by_user) == set(got_by_user), f"seed {seed}"
        for u, (n_e, s_e) in exp_by_user.items():
            n_g, s_g = got_by_user[u]
            assert n_g == n_e, f"seed {seed} user {u}: count"
            assert math.isclose(s_g, s_e, abs_tol=2e-6), (
                f"seed {seed} user {u}: {s_g} vs {s_e}"
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)


@pytest.mark.parametrize("seed", SEEDS)
def test_disordered_retention_fold_matches_batch(spark, seed):
    """Round-8b leg: the retention twin's presence-SET fold is
    order-insensitive BY CONSTRUCTION (distinct-union), so bounded
    disorder must land the folded triangle exactly on the batch one —
    the property that makes the presence set, not the cohort map, the
    right maintained state (a frozen cohort assignment would go stale
    when a user's earlier week arrives late)."""
    from bigdataminingproject_spark.operators.events import (
        cohort_triangle,
        cohort_triangle_from_uw,
        fold_user_weeks,
        user_week_partial,
    )
    from bigdataminingproject_spark.streaming.pipeline import snapshot_sink
    from bigdataminingproject_spark.streaming.statestore import (
        AppendOnlyPartsStore,
    )

    rows, _ = _gen_events(seed)
    df = spark.createDataFrame(
        rows, "arrival_pos long, event_id long, user_id long, epoch_s long"
    ).withColumn("ts", F.timestamp_seconds("epoch_s"))
    expected = {tuple(r) for r in cohort_triangle(df).collect()}
    stream, staging = _stage(spark, rows)
    state_root = tempfile.mkdtemp(prefix="fuzz_ret_state_")
    store = AppendOnlyPartsStore(
        spark,
        state_root,
        "fuzz_retention",
        merge_fanout=2,
        merge_transform=fold_user_weeks,
    )
    try:
        snapshot_sink(
            stream,
            lambda batch_df, bid: store.append(user_week_partial(batch_df)),
        )
        got = {
            tuple(r)
            for r in cohort_triangle_from_uw(
                fold_user_weeks(store.read())
            ).collect()
        }
        assert got == expected, f"seed {seed}: retention triangle mismatch"
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)


@pytest.mark.parametrize("seed", SEEDS)
def test_disordered_regression_fold_matches_batch(spark, seed):
    """Fifth leg (round 9): the OLS sufficient-statistics fold must
    land EXACTLY on the batch trend regardless of which disorder
    permutation sliced the batches — the sums are exact integers, so
    unlike the decay leg there is no float envelope at all."""
    from bigdataminingproject_spark.operators.trends import (
        finish_regression,
        fold_regression_partials,
        group_linear_trend,
        regression_partials,
    )
    from bigdataminingproject_spark.streaming.pipeline import snapshot_sink
    from bigdataminingproject_spark.streaming.statestore import (
        AppendOnlyPartsStore,
    )

    rows, _ = _gen_events(seed)
    df = (
        spark.createDataFrame(
            rows,
            "arrival_pos long, event_id long, user_id long, epoch_s long",
        )
        .withColumn("ts", F.timestamp_seconds("epoch_s"))
        .withColumn(
            "event_type",
            F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")),
        )
        .withColumn(
            "value",
            F.round((F.col("event_id") % 500) * 0.37 + 1.0, 2),
        )
    )
    expected = sorted(
        tuple(r) for r in group_linear_trend(df).collect()
    )
    stream, staging = _stage(spark, rows.copy())
    state_root = tempfile.mkdtemp(prefix="fuzz_reg_state_")
    store = AppendOnlyPartsStore(
        spark,
        state_root,
        "fuzz_reg",
        merge_fanout=2,
        merge_transform=fold_regression_partials,
    )

    def _upsert(batch_df, bid):
        b = (
            batch_df.withColumn(
                "event_type",
                F.concat(
                    F.lit("t"), (F.col("user_id") % 3).cast("string")
                ),
            )
            .withColumn(
                "value",
                F.round((F.col("event_id") % 500) * 0.37 + 1.0, 2),
            )
        )
        store.append(regression_partials(b))

    try:
        snapshot_sink(stream, _upsert)
        got = sorted(
            tuple(r)
            for r in finish_regression(
                fold_regression_partials(store.read())
            ).collect()
        )
        assert got == expected, f"seed {seed}"
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)
