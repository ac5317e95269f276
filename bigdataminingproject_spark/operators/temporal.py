"""Temporal join operators: as-of join, bucketed range (interval)
join, and point-in-time (SCD2 interval) join.

Neither exists in the reference (SURVEY.md §2.9 — it has no joins at all)
nor as a Spark built-in; both are staple operators of a time-series /
event-pipeline engine, so they're implemented here Spark-first:

- ``asof_join``: the classic "most recent right row at or before each
  left row, per key" (pandas ``merge_asof``, DuckDB/QuestDB ``ASOF
  JOIN``). A naive SQL formulation is a per-key inequality join —
  quadratic per key and un-shuffleable; the scale-correct plan is a
  tagged UNION + one window over (key, ts): a single shuffle on the key,
  linear scan per partition, no join at all.
- ``range_join``: "all right rows within ±tolerance of each left row,
  per key". The naive inequality join degenerates to a per-key cross
  product; bucketing both sides to tolerance-sized time buckets and
  equi-joining on (key, bucket±1) bounds each probe to a 3-bucket
  neighborhood, then the exact predicate filters — the standard
  interval-join strategy of streaming engines (Flink's interval join).

Both keep every expression JVM-side (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (inclusive, like
    DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``). Left rows with no prior
    right row keep NULLs.

    Plan: tag each side, union, then ``last(..., ignorenulls=True)`` over
    a window partitioned by the key and ordered by (ts, right-first) —
    one hash shuffle on the key; rows-unbounded-preceding running state,
    no per-key quadratic work. Right rows sort before left rows at equal
    timestamps so an exactly-simultaneous right row is visible.
    """
    rtag = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts first at ts ties
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    ltag = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtag.schema[f"{ts_col}{suffix}"].dataType).alias(
            f"{ts_col}{suffix}"
        ),
        *[
            F.lit(None)
            .cast(rtag.schema[f"{c}{suffix}"].dataType)
            .alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
        *[F.col(c) for c in left.columns],
    )
    carried = [f"{ts_col}{suffix}"] + [f"{c}{suffix}" for c in right_value_cols]
    # right rows carry only the union columns; left rows additionally
    # carry their own payload (null on right rows, dropped post-filter)
    rtag = rtag.select(
        "*", *[F.lit(None).cast(ltag.schema[c].dataType).alias(c)
               for c in left.columns]
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = rtag.unionByName(ltag)
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in carried
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_f_{c}").alias(c) for c in carried],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    tolerance_us: int,
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps differ
    by at most ``tolerance_us`` microseconds (closed interval, both
    directions).

    Plan: both sides bucket to ``tolerance_us``-wide time buckets; the
    left explodes to its bucket and both neighbors, so one equi-join on
    (key, bucket) covers every pair within tolerance; the exact |Δts| <=
    tolerance predicate then filters. The join is a plain hash shuffle —
    never a per-key cross product — and each probe touches a bounded
    3-bucket neighborhood. ``how='left'`` keeps unmatched left rows with
    NULL right columns (pairs are distinct because each right row lands
    in exactly one bucket).

    Output: left columns (prefixed ``l_``), right columns (``r_``).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    bucket = lambda c: (F.unix_micros(F.col(c)) / F.lit(tolerance_us)).cast(
        "long"
    )  # noqa: E731
    lb = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        F.explode(
            F.array(
                bucket(ts_col) - 1, bucket(ts_col), bucket(ts_col) + 1
            )
        ).alias("_bkt"),
        F.col(on).alias("_k"),
    )
    rb = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        bucket(ts_col).alias("_bkt"),
        F.col(on).alias("_k"),
    )
    within = (
        F.abs(
            F.unix_micros(F.col(f"l_{ts_col}"))
            - F.unix_micros(F.col(f"r_{ts_col}"))
        )
        <= tolerance_us
    )
    if how == "inner":
        return lb.join(rb, ["_k", "_bkt"]).filter(within).drop("_k", "_bkt")
    matched = (
        lb.join(rb, ["_k", "_bkt"]).filter(within).drop("_k", "_bkt")
    )
    # left rows with no in-range partner (anti join on the matched keys)
    left_pref = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    unmatched = left_pref.join(
        matched.select(*[f"l_{c}" for c in left.columns]).distinct(),
        [f"l_{c}" for c in left.columns],
        "left_anti",
    )
    return matched.unionByName(unmatched, allowMissingColumns=True)


# --- query registry entries -------------------------------------------------

def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase to the user's most recent
    click at or before it (classic last-touch attribution)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", right_value_cols=("click_id",)
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "click_id_right",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_right"))
        ).alias("gap_us"),
    ).withColumnRenamed("click_id_right", "click_id").orderBy("purchase_id")


def q_events_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, how many same-user events fall within
    +-5 minutes, and their total value (incident-context query)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    others = ev.select("event_id", "user_id", "ts", "value")
    tol = 300 * 1_000_000  # 5 min in microseconds
    pairs = range_join(errors, others, on="user_id", tolerance_us=tol).filter(
        F.col("l_event_id") != F.col("r_event_id")  # exclude the anchor
    )
    counts = pairs.groupBy(
        F.col("l_event_id").alias("error_id"),
        F.col("l_user_id").alias("user_id"),
    ).agg(
        F.count(F.lit(1)).alias("nearby_events"),
        F.round(F.sum("r_value"), 2).alias("nearby_value"),
    )
    # anchors with zero nearby events still report (0, 0.0)
    all_errors = errors.select(
        F.col("event_id").alias("error_id"), "user_id"
    )
    return (
        all_errors.join(counts, ["error_id", "user_id"], "left")
        .select(
            "error_id",
            "user_id",
            F.coalesce("nearby_events", F.lit(0)).alias("nearby_events"),
            F.coalesce("nearby_value", F.lit(0.0)).alias("nearby_value"),
        )
        .orderBy("error_id")
    )


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "us",
) -> DataFrame:
    """Point-in-time (time-travel) join: each fact row picks up the
    SCD2 interval covering its timestamp — ``valid_from_us <= ts <
    valid_to_us`` with the open current interval matching everything
    after its start. Left join: facts before the key's first interval
    keep NULL state.

    The third member of the temporal-join family (asof_join = nearest
    earlier EVENT, range_join = neighborhood, pit_join = enclosing
    VERSION), and the consumption side of ``events.scd2_history`` —
    together they are the CDC time-travel story: build the interval
    history once, then join any fact stream against it.

    Scale shape: an equi-join on the key with the interval predicate
    as residual — per-key history is small (one row per state change),
    so the join fans out by history length, then the residual keeps
    exactly one row per fact (intervals partition the timeline).
    """
    h = history.select(
        F.col(key_col).alias("_k"),
        "state",
        "valid_from_us",
        "valid_to_us",
    )
    cond = (
        (facts[key_col] == h["_k"])
        & (h["valid_from_us"] <= facts[ts_us_col])
        & (
            h["valid_to_us"].isNull()
            | (facts[ts_us_col] < h["valid_to_us"])
        )
    )
    return facts.join(h, cond, "left").drop(
        "_k", "valid_from_us", "valid_to_us"
    )


def q_events_pit_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What state was each user in when they purchased? Builds the
    SCD2 history from the NON-purchase stream, then point-in-time
    joins every purchase against it and aggregates per prior state
    ('none' = purchased before any tracked state)."""
    from bigdataminingproject_spark.operators.events import scd2_history

    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(ev.filter(F.col("event_type") != "purchase"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us"), "value"
    )
    joined = pit_join(purchases, hist)
    return (
        joined.groupBy(
            F.coalesce(F.col("state"), F.lit("none")).alias("prior_state")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("prior_state")
    )
