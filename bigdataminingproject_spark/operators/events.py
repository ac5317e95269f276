"""Event-stream analytics over the ``events`` table (batch replay form).

These re-express the reference's windowed streaming analytics (SURVEY.md
§2.5) on real event-time: tumbling windows for snapshots (W5), sliding
window ratios for burst detection (W3), plus sessionization (absent in the
reference, native to an event engine). Each has a live Structured
Streaming twin in ``bigdataminingproject_spark.streaming``.

All window math is exact ``groupBy`` over ``date_trunc`` buckets + window
functions — one shuffle per aggregation, no Python in the path, and the
per-key cardinality (event_type, user_id) keeps state bounded at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table

SESSION_GAP_MS = 30 * 60 * 1000  # 30-minute inactivity gap


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts + value sums per event type (W5 analogue)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("event_hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_hour", "event_type")
    )


def q_events_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst/spike detection: recent-vs-previous window ratio (W3).

    Reference semantics (streaming/detectors/burst_detector.py:43-77):
    ``recent`` = count in the current window, ``prev`` = count in the one
    before; spike iff recent >= min_count and (recent+eps)/(prev+eps) >=
    threshold. Here windows are 1-hour tumbling buckets per event_type and
    the smoothing eps=1; missing previous bucket counts as 0 via a
    coalesced lag over an hour-complete spine (lag over observed rows only
    would silently skip empty hours).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("event_hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("recent_count"))
    w = Window.partitionBy("event_type").orderBy("event_hour")
    scored = (
        hourly.withColumn("prev_hour", F.lag("event_hour").over(w))
        .withColumn("prev_count_raw", F.lag("recent_count").over(w))
        .withColumn(
            "prev_count",
            F.when(
                F.col("prev_hour") == F.col("event_hour") - F.expr("INTERVAL 1 HOUR"),
                F.col("prev_count_raw"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "ratio",
            F.round(
                (F.col("recent_count") + F.lit(1.0))
                / (F.col("prev_count") + F.lit(1.0)),
                4,
            ),
        )
    )
    return (
        scored.filter((F.col("recent_count") >= 5) & (F.col("ratio") >= 2.0))
        .select("event_type", "event_hour", "recent_count", "prev_count", "ratio")
        .orderBy(F.desc("ratio"), F.desc("recent_count"), "event_type", "event_hour")
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user via lag + running sum.

    Classic gaps-and-islands — entirely window functions, so it scales as
    one shuffle on user_id. (Streaming twin: session window in
    streaming/pipeline.py.)
    """
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sessions = (
        ev.withColumn("ts_ms", F.unix_millis("ts"))
        .withColumn("prev_ms", F.lag("ts_ms").over(by_user))
        .withColumn(
            "new_session",
            (
                F.col("prev_ms").isNull()
                | ((F.col("ts_ms") - F.col("prev_ms")) > F.lit(SESSION_GAP_MS))
            ).cast("int"),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session")
            .over(by_user.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("session_events"),
            (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by event volume (A7 top-k shape on events)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("event_count"), "user_id")
        .limit(20)
    )


def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: avg of props JSON field per event type.

    Uses regexp extraction (portable to the DuckDB oracle without JSON
    extensions); the engine-native path would be F.get_json_object /
    from_json with an explicit schema.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k":\\s*(\\d+)', 1).cast("int")
    return (
        ev.withColumn("k_val", k)
        .filter(F.col("k_val").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k_val"), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q_events_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session counts via Spark's native session_window.

    Same semantics as the gaps-and-islands formulation
    (q_events_sessionize) — verified identical on this data; the native
    operator is the streaming-ready form (works under watermarks too).
    The oracle uses the islands SQL, so this query cross-checks the two
    formulations against each other through DuckDB.
    """
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("session_events"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("session_events").alias("n_events"),
            F.max("session_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def time_rollup(
    events: DataFrame,
    grains: tuple[str, ...] = ("minute", "hour", "day"),
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style multi-grain time rollup (continuous aggregate).

    ONE fact-table scan and ONE shuffle for all grains, via grouping
    sets: each row is Expanded to G copies (one per grain's truncated
    bucket), then a single hash aggregate with map-side combine reduces
    every partition to its distinct (grain-bucket, key) partials before
    the exchange — so shuffle volume is ~the union of all grains'
    partials (≈1.05× the finest grain's alone), not G× the fact rows.

    This replaced a chained finest→coarser union (round 2): Catalyst's
    ReuseExchange never fired across the union branches (attribute ids
    differ per branch), so the "one scan" design actually planned THREE
    scans and seven exchanges — measured, not assumed (VERDICT r2 #5;
    plan pinned by test_plan_quality's exchange-count assertion).
    TimescaleDB/Druid materialize hierarchical rollups as state;
    declaratively, grouping sets is Spark's native shape for it.

    Output: (grain, bucket_ts, key, event_count, total_value).
    """
    return time_rollup_partials(
        events, grains, ts_col, key_col, value_col
    ).select(
        "grain",
        "bucket_ts",
        "key",
        "event_count",
        F.round(F.col("sum_value"), 2).alias("total_value"),
    )


def time_rollup_partials(
    events: DataFrame,
    grains: tuple[str, ...] = ("minute", "hour", "day"),
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """UNROUNDED multi-grain rollup partials: (grain, bucket_ts, key,
    event_count, sum_value). The mergeable state behind ``time_rollup``
    (which rounds at presentation) and the per-batch delta transform of
    the streaming continuous-aggregate twin — (count, sum) are
    associative, so partials from any slicing fold to the batch
    answer."""
    bucket = {g: f"_b_{g}" for g in grains}
    base = events.select(
        *[
            F.date_trunc(g, F.col(ts_col)).alias(b)
            for g, b in bucket.items()
        ],
        F.col(key_col).alias("key"),
        F.col(value_col).alias("_v"),
    )
    agg = base.groupingSets(
        [[F.col(b), F.col("key")] for b in bucket.values()],
        *[F.col(b) for b in bucket.values()],
        F.col("key"),
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum("_v").alias("_sum"),
        *[
            F.grouping(b).alias(f"_in_{g}")
            for g, b in bucket.items()
        ],
    )
    # exactly one bucket column is grouped per output row: grain = that
    # column's name, bucket_ts = its (sole non-null) value
    grain_expr = F
    for g in grains:
        grain_expr = (
            F.when(F.col(f"_in_{g}") == 0, F.lit(g))
            if grain_expr is F
            else grain_expr.when(F.col(f"_in_{g}") == 0, F.lit(g))
        )
    return agg.select(
        grain_expr.alias("grain"),
        F.coalesce(*[F.col(b) for b in bucket.values()]).alias("bucket_ts"),
        "key",
        "event_count",
        F.col("_sum").alias("sum_value"),
    )


def fold_rollup_partials(parts: DataFrame) -> DataFrame:
    """N-ary merge of rollup partials: sum (count, sum) per
    (grain, bucket_ts, key). Associative/commutative — the LSM store's
    ``merge_transform``: every compacted level holds one row per
    rollup cell (the CONTINUOUS-AGGREGATE state: bounded by bucket x
    key cardinality, never by the event log)."""
    return parts.groupBy("grain", "bucket_ts", "key").agg(
        F.sum("event_count").cast("bigint").alias("event_count"),
        F.sum("sum_value").alias("sum_value"),
    )


def finish_rollup(state: DataFrame) -> DataFrame:
    """Publish pass: fold and round — lands on ``time_rollup``'s
    output."""
    return fold_rollup_partials(state).select(
        "grain",
        "bucket_ts",
        "key",
        "event_count",
        F.round(F.col("sum_value"), 2).alias("total_value"),
    )


def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute/hour/day rollup of event counts and value by type."""
    ev = load_table(spark, sf_dir, "events")
    return time_rollup(ev).orderBy("grain", "bucket_ts", "key")


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per key, the earliest timestamp of each stage that
    occurs AT OR AFTER the previous stage's earliest qualifying time.

    Stage N+1 only counts if it happens once stage N is reached — the
    ordering constraint that separates a funnel from a pivot of min
    timestamps. One aggregation per stage, each keyed on ``key_col``:
    the first shuffle establishes the key partitioning and AQE reuses
    broadcast/shuffle reads for the later (already small, one row per
    qualifying key) stage relations. Stage timestamps are emitted as
    integer microseconds (cross-engine exact).

    Output: (key, stage_1_us, ..., stage_N_us) with NULLs from the first
    unreached stage onward; keys that never reach stage 1 are absent.
    """
    result = None
    for i, stage_type in enumerate(stages):
        col = f"stage_{i+1}_us"
        filtered = events.filter(F.col(type_col) == stage_type).select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col)).alias("_us"),
        )
        if result is None:
            result = filtered.groupBy("key").agg(F.min("_us").alias(col))
        else:
            prev_col = f"stage_{i}_us"
            nxt = (
                filtered.join(
                    result.select("key", prev_col), "key"
                )
                .filter(F.col("_us") >= F.col(prev_col))
                .groupBy("key")
                .agg(F.min("_us").alias(col))
            )
            result = result.join(nxt, "key", "left")
    return result.select(
        F.col("key").alias(key_col), *[f"stage_{i+1}_us" for i in range(len(stages))]
    ).orderBy(key_col)


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup -> click -> purchase funnel per user (ordered stages)."""
    ev = load_table(spark, sf_dir, "events")
    return funnel_stages(ev)


def cohort_retention(
    events: DataFrame,
    max_offset: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted on
    each subsequent day they return (offset 0..max_offset).

    The canonical product-analytics rollup, exact and scale-shaped: one
    aggregation to the per-user cohort day (broadcastable — one row per
    user), one equi-join back to the fact stream, and one distinct-count
    aggregation. No window over the fact table, no state.
    """
    first_day = events.groupBy(user_col).agg(
        F.min(F.date_trunc("day", F.col(ts_col))).alias("cohort_day")
    )
    joined = events.join(first_day, user_col).select(
        user_col,
        "cohort_day",
        F.datediff(
            F.date_trunc("day", F.col(ts_col)), F.col("cohort_day")
        ).alias("day_offset"),
    )
    return (
        joined.filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day cohort retention over the events stream."""
    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, max_offset=7)


def anomalous_windows(
    counts: DataFrame,
    bucket_col: str = "bucket",
    count_col: str = "x",
    z: int = 2,
) -> DataFrame:
    """Flag time buckets whose count deviates more than ``z`` sample
    standard deviations from the series mean — with EXACT integer
    arithmetic, no float z-scores.

    |x - mean| > z*sd is squared and cleared of divisions:

        (n*x - sx)^2 * (n-1) > z^2 * n * (n*sxx - sx^2)

    where n = bucket count, sx = Σx, sxx = Σx² are BIGINT aggregates.
    Every quantity is an exact integer on any engine, so the oracle
    comparison cannot drift at the flag boundary (a float z-score
    would flip for counts sitting exactly on the threshold). Bounds:
    with per-bucket counts up to ~10^6 and up to ~10^4 buckets the
    largest term is ~10^4·10^4·10^12 ≈ 10^20 — beyond that scale,
    promote to DECIMAL(38,0) before squaring.

    Shape: the per-bucket relation is already aggregated (one row per
    bucket); the 1-row (n, sx, sxx) aggregate broadcasts back over it.
    One fact-table shuffle upstream, nothing single-partition.
    """
    stats = counts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(count_col).alias("_sx"),
        F.sum(F.col(count_col) * F.col(count_col)).alias("_sxx"),
    )
    x = F.col(count_col)
    lhs = (
        (F.col("_n") * x - F.col("_sx"))
        * (F.col("_n") * x - F.col("_sx"))
        * (F.col("_n") - 1)
    )
    rhs = (
        F.lit(z * z)
        * F.col("_n")
        * (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    )
    return (
        counts.join(F.broadcast(stats))
        .filter(lhs > rhs)
        .select(bucket_col, count_col)
        .orderBy(bucket_col)
    )


def q_events_anomalous_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event volume is a >2-sigma outlier vs the whole
    series — exact-integer z-test (see ``anomalous_windows``)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("x"))
    return anomalous_windows(hourly)


def latest_by_key(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    hot_keys: bool = False,
) -> DataFrame:
    """CDC-style log compaction: the latest record per key.

    The upsert/merge primitive every incremental ingest needs — replayed
    change streams compact to current state by keeping, per key, the row
    with the greatest (ts, tiebreak). Default path: one shuffle on the
    key, a rank window inside each key partition, no global ordering. At
    100 TB this is the standard "compact the changelog" job shape
    (Delta/Hudi/Iceberg MERGE express the same thing). Skew note: for
    this row_number=1 filter shape Catalyst inserts a PARTIAL
    WindowGroupLimit before the exchange (Spark 3.5+), so a hot key
    ships one row per map partition to its final window task — measured
    flat (0.4 s) from 1M to 10M rows with one user owning 50% of the
    log (tools/skew_probe.py).

    ``hot_keys=True`` swaps the window for an aggregate-and-join-back,
    for engines/shapes where the group-limit inference cannot fire:
    ``max(struct(ts, tiebreak))`` per key partially aggregates
    MAP-SIDE — a key owning half the log contributes one row per input
    partition to the shuffle instead of all its rows to one sort task —
    and the left-semi join back hashes on the full (key, ts, tiebreak),
    which no single value dominates. Identical
    output to the window path provided ``tiebreak_col`` is unique per
    key (its job); with a duplicated (ts, tiebreak) the window keeps an
    arbitrary one of the tied rows while this path keeps all of them.
    """
    if hot_keys:
        top = events.groupBy(*key_cols).agg(
            F.max(F.struct(ts_col, tiebreak_col)).alias("_m")
        ).select(
            *key_cols,
            F.col(f"_m.{ts_col}").alias(ts_col),
            F.col(f"_m.{tiebreak_col}").alias(tiebreak_col),
        )
        return events.join(
            top, [*key_cols, ts_col, tiebreak_col], "left_semi"
        )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), F.desc(tiebreak_col)
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state per user: the most recent event (changelog
    compaction; ties broken by event_id descending)."""
    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(ev).select(
        "user_id", "event_id", "event_type", "ts", "value"
    ).orderBy("user_id")


def rolling_daily(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key daily totals with a trailing calendar-day rolling window.

    RANGE (not ROWS) framing over an integer day index, so a key with
    gap days still aggregates exactly the last ``window_days`` CALENDAR
    days — a ROWS frame would silently span 7 *observed* days instead.
    The window runs over the already-aggregated daily relation (days x
    keys — thousands of rows at any corpus size), so the fact table is
    shuffled once for the groupBy and never windowed directly.
    """
    daily = events.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.col(key_col).alias("key"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("_v"),
    )
    day_idx = F.datediff(F.col("day"), F.lit("2024-01-01"))
    w = (
        Window.partitionBy("key")
        .orderBy(day_idx)
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "key",
        "day",
        "n_events",
        F.round(F.col("_v"), 2).alias("day_value"),
        F.sum("n_events").over(w).alias("events_7d"),
        F.round(F.sum("_v").over(w), 2).alias("value_7d"),
    ).orderBy("key", "day")


def q_events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event volume per type with trailing-7-calendar-day totals."""
    ev = load_table(spark, sf_dir, "events")
    return rolling_daily(ev, window_days=7)


def active_users_window(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """DAU + trailing WAU per day (growth-analytics headline metrics).

    Exact distinct counts: dedup to (day, user) once [the only
    fact-table shuffle], broadcast the tiny distinct-days relation,
    range-join each day to its trailing window, then one aggregate
    computes DAU (distinct users on the day itself, via conditional
    count) and WAU (distinct users across the window) together. Join
    fan-out is bounded by window_days x |day-user pairs| of
    pre-deduplicated rows — never raw events.
    """
    du = events.select(
        F.date_trunc("day", F.col(ts_col)).alias("u_day"),
        F.col(user_col).alias("user"),
    ).distinct()
    days = du.select(F.col("u_day").alias("day")).distinct()
    lo = F.col("day") - F.expr(f"INTERVAL {window_days - 1} DAYS")
    joined = du.join(
        F.broadcast(days),
        (F.col("u_day") >= lo) & (F.col("u_day") <= F.col("day")),
    )
    return (
        joined.groupBy("day")
        .agg(
            F.count_distinct(
                F.when(F.col("u_day") == F.col("day"), F.col("user"))
            ).alias("dau"),
            F.count_distinct("user").alias("wau"),
        )
        .orderBy("day")
    )


def q_events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU for every active day."""
    ev = load_table(spark, sf_dir, "events")
    return active_users_window(ev, window_days=7)


def cohort_triangle(
    events: DataFrame,
    anchor: str = "2024-01-01",
    period_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort-retention TRIANGLE (rate matrix): users are cohorted by their first
    active period; each cell is how many of them return ``offset``
    periods later — the standard product-analytics triangle every event
    warehouse serves.

    Period index = floor(day-index / period_days) over an integer day
    index from ``anchor`` (engine-stable arithmetic, no locale-dependent
    week-truncation semantics). All three heavy steps shuffle on the
    SAME high-cardinality user key — distinct (user, period), min-period
    cohort, cohort join — so they co-partition; the matrix itself is
    periods x offsets (tiny at any corpus size) and the rate division
    uses the engine-stable half-up rule.
    """
    return cohort_triangle_from_uw(
        user_week_partial(
            events, anchor=anchor, period_days=period_days,
            ts_col=ts_col, user_col=user_col,
        )
    )


def user_week_partial(
    events: DataFrame,
    anchor: str = "2024-01-01",
    period_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Distinct (u, wk) presence pairs of a slice of the event stream —
    the mergeable partial of the retention triangle. Presence is a SET,
    closed under distinct-union, so any fold order rebuilds the exact
    corpus relation; state is users x active-weeks, never events."""
    day_idx = F.datediff(
        F.date_trunc("day", F.col(ts_col)), F.lit(anchor)
    )
    return (
        events.select(
            F.col(user_col).alias("u"),
            F.floor(day_idx / F.lit(float(period_days))).alias("wk"),
        )
        .distinct()
    )


def fold_user_weeks(parts: DataFrame) -> DataFrame:
    """LSM merge-operator for the retention twin: distinct union."""
    return parts.distinct()


def cohort_triangle_from_uw(uw: DataFrame) -> DataFrame:
    """The cohort/offset/rate half of ``cohort_triangle``, taking the
    distinct (u, wk) presence relation so the streaming twin's folded
    state can enter the same publish path."""
    from bigdataminingproject_spark.functions.numeric import (
        stable_round_div,
    )

    coh = uw.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    m = (
        uw.join(coh, "u")
        .groupBy(
            "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("period_offset")
        )
        .agg(F.countDistinct("u").alias("active_users"))
    )
    base = m.filter(F.col("period_offset") == 0).select(
        "cohort_week", F.col("active_users").alias("cohort_size")
    )
    return (
        m.join(base, "cohort_week")
        .select(
            "cohort_week",
            "period_offset",
            "active_users",
            "cohort_size",
            stable_round_div(
                F.col("active_users"), F.col("cohort_size"), 4
            ).alias("retention_rate"),
        )
        .orderBy("cohort_week", "period_offset")
    )


def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over the event stream."""
    from bigdataminingproject_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    return cohort_triangle(events)


def funnel_latency(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-transition funnel conversion rates and time-to-convert
    percentiles — the latency half of funnel analytics (how MANY convert
    is funnel_stages; how FAST is this).

    Built directly on the ordered funnel relation (one row per user who
    reached stage 1), so each transition is a single hash-agg over an
    already user-collapsed relation. Latencies are integer-microsecond
    differences scaled to seconds (deterministic doubles); p50/p90 use
    exact linear-interpolated percentiles ((n-1)p rank, the same
    definition as SQL quantile_cont), rounded at 4dp; conversion rates
    use the engine-stable half-up division.
    """
    from bigdataminingproject_spark.functions.numeric import (
        stable_round_div,
    )

    f = funnel_stages(
        events, stages, key_col=key_col, ts_col=ts_col, type_col=type_col
    )
    segs = []
    for i in range(len(stages) - 1):
        a, b = f"stage_{i + 1}_us", f"stage_{i + 2}_us"
        lat = F.when(
            F.col(b).isNotNull(),
            (F.col(b) - F.col(a)) / F.lit(1_000_000.0),
        )
        seg = (
            f.filter(F.col(a).isNotNull())
            .agg(
                F.count(a).alias("n_reached"),
                F.count(b).alias("n_converted"),
                F.round(F.percentile(lat, 0.5), 4).alias("p50_latency_s"),
                F.round(F.percentile(lat, 0.9), 4).alias("p90_latency_s"),
            )
            .select(
                F.lit(f"{stages[i]}->{stages[i + 1]}").alias("transition"),
                "n_reached",
                "n_converted",
                # a stage nobody reaches must yield a NULL rate, not an
                # ANSI divide-by-zero
                F.when(
                    F.col("n_reached") > 0,
                    stable_round_div(
                        F.col("n_converted"), F.col("n_reached"), 4
                    ),
                ).alias("conv_rate"),
                "p50_latency_s",
                "p90_latency_s",
            )
        )
        segs.append(seg)
    out = segs[0]
    for s in segs[1:]:
        out = out.unionByName(s)
    return out.orderBy("transition")


def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate + latency percentiles for each funnel transition."""
    ev = load_table(spark, sf_dir, "events")
    return funnel_latency(ev)


def scd2_history(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream:
    one validity interval per state change, with ``valid_to`` = the next
    change's timestamp (NULL = current) — the other half of the CDC
    story next to ``latest_by_key`` (compaction keeps only the last
    state; SCD2 keeps the full, interval-indexed history every
    time-travel join consumes).

    Consecutive records with the SAME attribute value collapse into one
    interval (the groups-of-changes step): a lag comparison marks change
    points, a running sum numbers each run, and min/max inside the run
    yield the interval. All three windows partition on the key — one
    shuffle, no global ordering. Timestamps emit as integer
    microseconds (cross-engine exact).
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    marked = events.select(
        *key_cols,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(attr_col).alias("state"),
    ).withColumn(
        "_chg",
        F.when(
            F.lag("state").over(
                Window.partitionBy(*keys).orderBy("_us", "_tb")
            ).isNull()
            | (
                F.lag("state").over(
                    Window.partitionBy(*keys).orderBy("_us", "_tb")
                )
                != F.col("state")
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = marked.withColumn(
        "_run",
        F.sum("_chg").over(
            Window.partitionBy(*keys)
            .orderBy("_us", "_tb")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    hist = runs.groupBy(*key_cols, "_run").agg(
        F.min("state").alias("state"),  # constant within a run
        F.min("_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_records"),
    )
    nxt = Window.partitionBy(*keys).orderBy("_run")
    return (
        hist.withColumn(
            "valid_to_us", F.lead("valid_from_us").over(nxt)
        )
        .select(
            *key_cols,
            F.col("_run").alias("version"),
            "state",
            "valid_from_us",
            "valid_to_us",
            "n_records",
        )
        .orderBy(*key_cols, "version")
    )


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user type-2 history of event_type state changes."""
    ev = load_table(spark, sf_dir, "events")
    return scd2_history(ev)


def hourly_rollup_partial(events: DataFrame) -> DataFrame:
    """Mergeable partial state of the hourly rollup: raw (count, sum)
    per (hour, type) — the snapshot an incremental pipeline persists.
    Rounding happens only at presentation (``finish_hourly_rollup``),
    never in stored state, so merges stay exact."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("event_hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum("value").alias("_value_sum"),
    )


def merge_hourly_rollup(
    snapshot: DataFrame, delta_events: DataFrame
) -> DataFrame:
    """Incremental materialized-view maintenance: fold a new slice of
    the event log into a persisted rollup snapshot WITHOUT touching the
    historical log — the union + re-aggregate merge is the associative
    step that lets a 100 TB pipeline pay only for each day's delta.

    Only buckets present in the delta shuffle again (the union's
    snapshot side is already one row per bucket); correctness rests on
    count/sum being mergeable partials, pinned by the equivalence test
    and by sharing the batch query's oracle."""
    d = hourly_rollup_partial(delta_events)
    return (
        snapshot.unionByName(d)
        .groupBy("event_hour", "event_type")
        .agg(
            F.sum("event_count").alias("event_count"),
            F.sum("_value_sum").alias("_value_sum"),
        )
    )


def finish_hourly_rollup(partial: DataFrame) -> DataFrame:
    """Presentation pass: round the stored raw sums (2 dp, the batch
    query's quantum) and order."""
    return partial.select(
        "event_hour",
        "event_type",
        "event_count",
        F.round("_value_sum", 2).alias("total_value"),
    ).orderBy("event_hour", "event_type")


def q_events_hourly_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin of q_events_hourly: snapshot 80% of the log,
    merge the remaining 20% as a delta, present. Must land exactly on
    the full recompute — same oracle."""
    ev = load_table(spark, sf_dir, "events")
    old = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    snapshot = hourly_rollup_partial(old)
    return finish_hourly_rollup(merge_hourly_rollup(snapshot, delta))


def transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (from_type, to_type) pair of CONSECUTIVE
    events of the same user, the transition count and the conditional
    probability P(to | from) — the behavioral-model summary next-event
    prediction and anomaly scoring start from (north-star; the
    reference has no sequence analytics).

    Scale shape: ONE shuffle on user_id for the lead() window (the
    same co-partitioning every other per-user operator here uses),
    then a hash-agg to the #types x #types relation — tiny by
    construction — on which the per-from totals are a broadcastable
    second agg. Ordering within a user is (ts, event_id): event_id
    breaks same-timestamp ties deterministically.

    Parity: counts are exact integers; prob is the engine-stable
    half-up 4 dp quotient of two integers.
    """
    from bigdataminingproject_spark.functions.numeric import (
        stable_round_div,
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    pairs = steps.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("_from_total")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            stable_round_div(
                F.col("n_transitions"), F.col("_from_total"), 4
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix of consecutive same-user events."""
    return transition_matrix(load_table(spark, sf_dir, "events"))


MARKOV_ITERS = 3


def markov_stationary(
    events: DataFrame, iters: int = MARKOV_ITERS
) -> DataFrame:
    """Approximate stationary distribution of the per-user event-type
    Markov chain: ``iters`` synchronous power-iteration steps from the
    uniform start — "where does user behavior settle", the asymptotic
    summary on top of ``transition_matrix``'s one-step view.

    Chain definition (pinned for parity): states = every type
    appearing in a same-user consecutive pair (either side); row i's
    probabilities are the 10-dp quotients count_ij/total_i; a state
    with NO outgoing transitions is absorbing (self-loop 1), so mass
    is conserved each step. Fixed iteration count, 10-dp quantization
    of the in-sums and the updated vector — the PageRank determinism
    device — lets DuckDB replay the walk bit-for-bit.

    Scale shape: the one corpus-sized operation is the lead() window's
    user_id shuffle (shared with every per-user operator); everything
    after lives on the #types×#types relation. The π vector is a
    DataFrame end to end — K reaches the driver as one long."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    pairs = (
        steps.groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    states = (
        pairs.select(F.col("src").alias("s"))
        .unionAll(pairs.select(F.col("dst").alias("s")))
        .distinct()
        .persist()
    )
    k = states.count()  # ONE driver long (#event types)
    if k == 0:
        return events.sparkSession.createDataFrame(
            [], "event_type string, stationary_p double, rank int"
        )
    totals = pairs.groupBy("src").agg(F.sum("n").alias("total"))
    probs = pairs.join(totals, "src").select(
        "src",
        "dst",
        F.round(
            F.col("n").cast("double") / F.col("total").cast("double"),
            10,
        ).alias("p"),
    )
    sinks = states.join(
        totals.select(F.col("src").alias("s")), "s", "left_anti"
    ).withColumn("sink", F.lit(1))
    pi = states.select(
        "s", F.round(F.lit(1.0) / F.lit(float(k)), 10).alias("pi")
    )
    for _ in range(iters):
        inflow = (
            probs.join(pi, probs["src"] == pi["s"])
            .groupBy("dst")
            .agg(F.round(F.sum(F.col("pi") * F.col("p")), 10).alias("m"))
        )
        held = pi.join(sinks.select("s"), "s", "left_semi").select(
            F.col("s").alias("hs"), F.col("pi").alias("held")
        )
        pi = (
            states.join(inflow, states["s"] == inflow["dst"], "left")
            .join(held, states["s"] == held["hs"], "left")
            .select(
                "s",
                F.round(
                    F.coalesce("m", F.lit(0.0))
                    + F.coalesce("held", F.lit(0.0)),
                    10,
                ).alias("pi"),
            )
            .localCheckpoint(eager=False)
        )
    wr = Window.orderBy(F.desc("stationary_p"), F.asc("event_type"))
    return (
        pi.select(
            F.col("s").alias("event_type"),
            F.col("pi").alias("stationary_p"),
        )
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .orderBy("rank")
    )


def q_events_markov_stationary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stationary event-type mix after 3 power-iteration steps of the
    behavioral Markov chain."""
    return markov_stationary(load_table(spark, sf_dir, "events"))


def markov_oracle_sql(iters: int = MARKOV_ITERS) -> str:
    """DuckDB mirror of ``q_events_markov_stationary``: the
    transitions CTE, the 10-dp row-normalized matrix, the absorbing
    self-loop rule, and one CTE block per power-iteration step with
    the identical quantization points."""
    blocks = [
        """
WITH st AS (
    SELECT event_type AS src,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
),
pairs AS MATERIALIZED (
    SELECT src, dst, count(*) AS n FROM st
    WHERE dst IS NOT NULL GROUP BY src, dst
),
states AS MATERIALIZED (
    SELECT DISTINCT s FROM (
        SELECT src AS s FROM pairs UNION ALL SELECT dst FROM pairs
    )
),
kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM states),
totals AS (SELECT src, sum(n) AS total FROM pairs GROUP BY src),
probs AS MATERIALIZED (
    SELECT src, dst,
           round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 10) AS p
    FROM pairs JOIN totals USING (src)
),
sinks AS (
    SELECT s FROM states
    WHERE s NOT IN (SELECT src FROM totals)
),
pi0 AS (SELECT s, round(1.0 / k, 10) AS pi FROM states, kk)"""
    ]
    for t in range(1, iters + 1):
        blocks.append(
            f""",
pi{t} AS (
    SELECT st.s,
           round(coalesce(fl.m, 0.0)
                 + CASE WHEN st.s IN (SELECT s FROM sinks)
                        THEN p.pi ELSE 0.0 END, 10) AS pi
    FROM states st
    JOIN pi{t - 1} p ON p.s = st.s
    LEFT JOIN (
        SELECT pr.dst, round(sum(pp.pi * pr.p), 10) AS m
        FROM probs pr JOIN pi{t - 1} pp ON pp.s = pr.src
        GROUP BY pr.dst
    ) fl ON fl.dst = st.s
)"""
        )
    blocks.append(
        f"""
SELECT s AS event_type, pi AS stationary_p,
       CAST(row_number() OVER (ORDER BY pi DESC, s) AS INT) AS rank
FROM pi{iters}
ORDER BY rank"""
    )
    return "".join(blocks)


def session_paths(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_MS,
    max_steps: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """Top event-type paths: the first ``max_steps`` event types of
    each session joined ``a>b>c``, counted across sessions — the
    sequential-pattern summary behind "what do users actually do"
    product analytics (north-star; sequence mining is absent from the
    reference).

    Scale shape: ONE shuffle on user_id serves everything. The
    session-scoped window and aggregate key on (user_id, session_seq),
    which hashpartitioning(user_id) already satisfies (subset rule),
    so Catalyst plans sorts but no further exchanges until the final
    tiny path-count relation. Agg state per session stays bounded at
    ``max_steps`` structs — collect_list only accumulates ranked
    entries at or below the cut (the CASE yields null past it), same
    device as the inverted-index posting head.
    """
    # Windows order by full-precision ts (not the ms-truncated ts_ms,
    # which is only the gap operand) so same-user same-millisecond
    # events rank identically to the DuckDB oracle and to sessionize.
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        events.withColumn("ts_ms", F.unix_millis("ts"))
        .withColumn("prev_ms", F.lag("ts_ms").over(by_user))
        .withColumn(
            "new_session",
            (
                F.col("prev_ms").isNull()
                | ((F.col("ts_ms") - F.col("prev_ms")) > F.lit(gap_ms))
            ).cast("int"),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session")
            .over(by_user.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    in_session = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    ranked = marked.withColumn("rk", F.row_number().over(in_session))
    entry = F.when(
        F.col("rk") <= max_steps,
        F.struct(F.col("rk"), F.col("event_type").alias("t")),
    )
    paths = ranked.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(entry)), lambda x: x["t"]
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_n)
    )


def q_events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 five-step session paths over 30-min-gap sessions."""
    return session_paths(load_table(spark, sf_dir, "events"))


def lttb_downsample(events: DataFrame, n_buckets: int = 50) -> DataFrame:
    """Largest-triangle time-series downsampling (Steinarsson 2013,
    fixed neighbor-mean anchors): reduce the event value series to one
    representative point per time bucket — the point forming the
    biggest triangle with the NEIGHBOR buckets' mean points, which is
    what keeps peaks/valleys a naive per-bucket average flattens. The
    dashboard-feeding shape every monitoring stack runs over raw
    events at scale (north-star; the reference has no time-series
    reduction at all). The classic LTTB anchors on the previously
    SELECTED point (sequential); the fixed-anchor variant trades that
    for full parallelism — every bucket decides independently — which
    is the published MapReduce adaptation and the right 100 TB shape.

    Plan: one scalar min/max agg (broadcast), bucket assignment as a
    pure projection, bucket means via one hash agg (``n_buckets``
    rows, broadcast back), then the per-bucket argmax WITHOUT a rank
    window: min-metric hash agg -> equality join -> min-id hash agg ->
    detail join. No window ever partitions the scaling relation; every
    aggregate map-side combines. First/last buckets pin the series
    endpoints (ts-min / ts-max points), the LTTB convention.

    Parity: bucket ids, x offsets, rounded means (stable_avg 6dp), and
    the 6dp half-up triangle area are deterministic double functions
    of integer inputs, so metric equality and the min aggregates match
    the SQL oracle exactly. Output carries the exact integer
    microsecond offset rather than the raw timestamp (the parquet
    stores nanos; Spark reads micros — emitting the offset keeps the
    value hash engine-neutral).
    """
    from bigdataminingproject_spark.functions.numeric import stable_avg

    base = events.select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.col("value").cast("double").alias("value"),
    )
    mm = base.agg(
        F.min("us").alias("mn"),
        F.max("us").alias("mx"),
    )
    nb = float(n_buckets)
    pts = (
        base.join(F.broadcast(mm))
        .withColumn(
            "bucket",
            F.floor(
                (F.col("us") - F.col("mn"))
                * F.lit(nb)
                / (F.col("mx") - F.col("mn") + F.lit(1))
            ).cast("int"),
        )
        .withColumn("t_us", (F.col("us") - F.col("mn")))
        .withColumn("x", F.col("t_us") / F.lit(1e6))
        .withColumn(
            "bmax",
            F.floor(
                (F.col("mx") - F.col("mn"))
                * F.lit(nb)
                / (F.col("mx") - F.col("mn") + F.lit(1))
            ).cast("int"),
        )
    )
    means = pts.groupBy("bucket").agg(
        stable_avg(F.col("x"), 6).alias("xm"),
        stable_avg(F.col("value"), 6).alias("ym"),
    )
    prev = means.select(
        (F.col("bucket") + 1).alias("bucket"),
        F.col("xm").alias("xa"),
        F.col("ym").alias("ya"),
    )
    nxt = means.select(
        (F.col("bucket") - 1).alias("bucket"),
        F.col("xm").alias("xc"),
        F.col("ym").alias("yc"),
    )
    own = means.select(
        "bucket",
        F.col("xm").alias("xo"),
        F.col("ym").alias("yo"),
    )
    # Neighbor means are LEFT-joined with a fallback to the point's own
    # bucket mean: with equal-width time buckets a neighbor can be empty
    # (sparse/clustered series), and an inner join would silently drop
    # every point of the adjacent bucket — no representative emitted.
    # Falling back to the own-bucket mean degenerates the triangle for
    # the missing side (that term contributes 0 area), so the bucket
    # still elects a deterministic winner (min event_id on area ties).
    interior = (
        pts.filter(
            (F.col("bucket") != 0) & (F.col("bucket") != F.col("bmax"))
        )
        .join(F.broadcast(own), "bucket")
        .join(F.broadcast(prev), "bucket", "left")
        .join(F.broadcast(nxt), "bucket", "left")
        .withColumn("xa", F.coalesce("xa", "xo"))
        .withColumn("ya", F.coalesce("ya", "yo"))
        .withColumn("xc", F.coalesce("xc", "xo"))
        .withColumn("yc", F.coalesce("yc", "yo"))
        .withColumn(
            "_diff",
            (F.col("xa") - F.col("xc")) * (F.col("value") - F.col("ya"))
            - (F.col("xa") - F.col("x")) * (F.col("yc") - F.col("ya")),
        )
        # half-up 6dp quantized area, negated so min() = biggest triangle
        .withColumn(
            "metric",
            -(
                F.floor(F.abs(F.col("_diff")) * F.lit(1e6) + F.lit(0.5))
                / F.lit(1e6)
            ),
        )
        .select("bucket", "event_id", "t_us", "value", "metric")
    )
    edges = pts.filter(
        (F.col("bucket") == 0) | (F.col("bucket") == F.col("bmax"))
    ).select(
        "bucket",
        "event_id",
        "t_us",
        "value",
        # first bucket keeps its earliest point, last its latest
        F.when(F.col("bucket") == 0, F.col("x"))
        .otherwise(-F.col("x"))
        .alias("metric"),
    )
    scoredpts = interior.unionByName(edges)
    best = scoredpts.groupBy("bucket").agg(F.min("metric").alias("_m"))
    winner_ids = (
        scoredpts.join(F.broadcast(best), "bucket")
        .filter(F.col("metric") == F.col("_m"))
        .groupBy("bucket")
        .agg(F.min("event_id").alias("event_id"))
    )
    return (
        scoredpts.join(F.broadcast(winner_ids), ["bucket", "event_id"])
        .select("bucket", "event_id", "t_us", "value")
        .orderBy("bucket")
    )


def q_events_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style 50-bucket downsample of the full event value series."""
    return lttb_downsample(load_table(spark, sf_dir, "events"), 50)


def time_decay_scores(
    events: DataFrame,
    tau_days: float = 1.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Exponentially-decayed activity score per user AS OF each user's
    last event — the classic feature-store recency feature
    (s = Σ_j exp(-(t_last - t_j)/τ); a user with 100 events last month
    scores below one with 5 events today).

    The naive formulation re-reads a user's whole history at every
    evaluation (O(n²) per user). The scale shape here is the
    prefix-factorization: exp(-(t_i - t_j)) = exp(-t_i) · exp(t_j), so
    the running score is exp(-d_i) times a CUMULATIVE windowed sum of
    exp(d_j) — one user-partitioned window over one shuffle, O(n)
    total, and incrementally maintainable (the cumsum is a fold).

    Determinism contract: event times are exact integer epoch-micros
    (``unix_micros`` / DuckDB ``epoch_us``); d = (us - per-user min us)
    / (τ·86.4e9) is one IEEE division of exact integers; the summation
    error of the cumulative exp sum scales DOWN by the same exp(-d_i)
    factor that rescales the sum, so the 6 dp round absorbs both
    engines' summation-order difference.

    Overflow bound: exp(d) requires per-user span / τ < ~700 (double
    max). For multi-year histories at τ=1d, segment the factorization
    (per-month bases with carried scale) — at this corpus's 30-day span
    the single-base form is exact.
    """
    us = F.unix_micros(F.col(ts_col))
    w_user = Window.partitionBy(user_col)
    w_cum = (
        Window.partitionBy(user_col)
        .orderBy(F.asc("us"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_last = Window.partitionBy(user_col).orderBy(
        F.desc("us"), F.desc(id_col)
    )
    scored = (
        events.select(user_col, id_col, us.alias("us"))
        .withColumn(
            "d",
            (F.col("us") - F.min("us").over(w_user))
            / F.lit(tau_days * 86400000000.0),
        )
        .withColumn("cs", F.sum(F.exp("d")).over(w_cum))
        .withColumn("n_events", F.count(F.lit(1)).over(w_user))
        .withColumn("rn", F.row_number().over(w_last))
    )
    return (
        scored.filter(F.col("rn") == 1)
        .select(
            user_col,
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.exp(-F.col("d")) * F.col("cs"), 6).alias(
                "decay_score"
            ),
        )
        .orderBy(user_col)
    )


def q_events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-decayed activity (τ = 1 day) at each
    user's last event — O(n) via the prefix-factorized cumulative sum."""
    ev = load_table(spark, sf_dir, "events")
    return time_decay_scores(ev, tau_days=1.0)


def decay_partials(
    events: DataFrame,
    tau_days: float = 1.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user decayed-counter partial of ONE event slice — the
    mergeable state behind ``time_decay_scores``: (base_us = slice-min
    event time, sum_exp = Σ exp((t_j - base)/τ), last_us, n). Everything
    downstream needs is four numbers per user; the raw events are never
    kept."""
    tau_us = tau_days * 86400000000.0
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy("user_id")
    pre = events.select(
        F.col(user_col).alias("user_id"), us.alias("us")
    ).withColumn("_b", F.min("us").over(w))
    return pre.groupBy("user_id").agg(
        F.min("us").alias("base_us"),
        F.sum(
            F.exp(
                (F.col("us") - F.col("_b")).cast("double") / F.lit(tau_us)
            )
        ).alias("sum_exp"),
        F.max("us").alias("last_us"),
        F.count(F.lit(1)).alias("n"),
    )


def fold_decay_partials(
    parts: DataFrame, tau_days: float = 1.0
) -> DataFrame:
    """N-ary merge of decayed-counter partials: rebase every partial's
    exp-sum onto the user's smallest base (multiply by
    exp((base_p - new_base)/τ) — the decayed-counter merge law), then
    sum. Associative/commutative, so it serves as the LSM store's
    ``merge_transform``: every compacted level holds ONE row per user
    regardless of how many batches fed it."""
    tau_us = tau_days * 86400000000.0
    w = Window.partitionBy("user_id")
    rebased = parts.withColumn(
        "_nb", F.min("base_us").over(w)
    ).withColumn(
        "_scaled",
        F.col("sum_exp")
        * F.exp(
            (F.col("base_us") - F.col("_nb")).cast("double") / F.lit(tau_us)
        ),
    )
    return rebased.groupBy("user_id").agg(
        F.min("base_us").alias("base_us"),
        F.sum("_scaled").alias("sum_exp"),
        F.max("last_us").alias("last_us"),
        F.sum("n").alias("n"),
    )


def finish_decay(state: DataFrame, tau_days: float = 1.0) -> DataFrame:
    """Publish pass: score at each user's last event from the folded
    counter — lands exactly on ``time_decay_scores``'s output."""
    tau_us = tau_days * 86400000000.0
    return (
        fold_decay_partials(state, tau_days)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(
                F.exp(
                    -(F.col("last_us") - F.col("base_us")).cast("double")
                    / F.lit(tau_us)
                )
                * F.col("sum_exp"),
                6,
            ).alias("decay_score"),
        )
        .orderBy("user_id")
    )
