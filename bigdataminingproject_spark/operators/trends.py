"""Time-series statistics over the event stream: per-group linear
trends (exact OLS from mergeable sufficient statistics), the hourly
autocorrelation function, and CUSUM mean-shift changepoint detection.

No reference counterpart (the reference has no numeric/time-series
surface at all — SURVEY.md §2.9); these are the staple operators of a
metrics/observability engine, implemented Spark-first:

- ``group_linear_trend``: simple OLS of value on time, per group. The
  whole regression reduces to six SUFFICIENT STATISTICS per group —
  (n, Σx, Σy, Σx², Σxy, Σy²) — which are plain associative integer
  sums: one map-side-combinable hash aggregate over the scan, driver
  state O(groups). Because x is an exact integer hour index and y an
  exact integer cent count, the sums are EXACT (shuffle-order
  immune), and the only floating-point work is the final per-group
  slope/intercept/r² arithmetic — one pinned expression tree that
  DuckDB replays bit-for-bit. The statistics are also closed under
  addition, which is what the streaming twin folds in its LSM store
  (``q_stream_regression_maintenance``).
- ``hourly_autocorr``: the ACF of the corpus-wide hourly event count
  at lags 1..L. The 100-TB shape: one heavy scan collapses the corpus
  to an O(hours) series, then all lag work happens on that tiny
  relation (a broadcast self-join per lag — no second pass over the
  raw data). Pearson r per lag is again exact-integer sums + one
  final float expression.
- ``cusum_changepoints``: per-group CUSUM mean-shift scan (Page 1954):
  S_h = Σ_{i<=h} (c_i - mean), changepoint = argmax |S_h|. The
  cumulative walk is a window running sum over the dense O(hours)
  series (left-to-right on both engines, so doubles agree exactly);
  the argmax tie-breaks to the earliest hour.

Cross-engine determinism discipline (the repo standard): integers
until the last step — x = (epoch_us - REG_BASE_US) DIV 3.6e9, y =
floor(value*100 + 0.5) cents — then ONE double expression, rounded,
identical in shape on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table

# Pinned epoch for the hour index: 2024-01-01 00:00:00 UTC. A constant
# (not the corpus min) so batch, streaming micro-batches, and the
# DuckDB oracle all agree on x without a data-dependent pre-pass.
REG_BASE_US = 1_704_067_200_000_000
US_PER_HOUR = 3_600_000_000


def hour_index(ts_col: str = "ts") -> Column:
    """Integer hours since REG_BASE_US (exact bigint DIV — mirrors the
    oracle's ``//`` so no float rounding can sit between the engines)."""
    return F.expr(
        f"(unix_micros({ts_col}) - {REG_BASE_US}L) DIV {US_PER_HOUR}L"
    )


def cents(col: str = "value") -> Column:
    """Exact integer cents via the repo's floor(x*100 + 0.5) idiom."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


def regression_partials(
    df: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Per-key OLS sufficient statistics (k, n, sx, sy, sxx, sxy, syy)
    of y = cents(value) on x = hour_index(ts). All exact bigint sums —
    associative and commutative, so partials from disjoint row sets
    fold by per-key addition (``fold_regression_partials``)."""
    pts = df.select(
        F.col(key_col).alias("k"),
        hour_index().alias("x"),
        cents().alias("y"),
    )
    return pts.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )


def fold_regression_partials(parts: DataFrame) -> DataFrame:
    """LSM merge-operator: stacked per-key partial rows collapse into
    one row per key by plain addition (exact integer sums)."""
    return parts.groupBy("k").agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
        F.sum("syy").alias("syy"),
    )


def finish_regression(state: DataFrame) -> DataFrame:
    """Slope / intercept / r² from folded sufficient statistics. One
    pinned double-expression tree (identical in the oracle SQL):

      cov_n  = n*sxy - sx*sy          (times n — scale cancels)
      var_xn = n*sxx - sx*sx
      var_yn = n*syy - sy*sy
      slope  = cov_n / var_xn / 100       [value units per hour]
      icept  = (sy - cov_n/var_xn * sx) / n / 100
      r2     = cov_n*cov_n / (var_xn * var_yn)
    """
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("sxy") - d("sx") * d("sy")
    var_xn = d("n") * d("sxx") - d("sx") * d("sx")
    var_yn = d("n") * d("syy") - d("sy") * d("sy")
    return state.select(
        F.col("k").alias("event_type"),
        F.col("n").alias("n_rows"),
        F.round(cov_n / var_xn / 100, 6).alias("slope_per_hour"),
        F.round(
            (d("sy") - cov_n / var_xn * d("sx")) / d("n") / 100, 6
        ).alias("intercept"),
        F.when(
            (var_xn > 0) & (var_yn > 0),
            F.round(cov_n * cov_n / (var_xn * var_yn), 6),
        ).alias("r2"),
    )


def group_linear_trend(
    df: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Exact per-group OLS trend of value on event time."""
    return finish_regression(regression_partials(df, key_col))


def q_events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each event type's value drifting over the month? Exact OLS
    slope/intercept/r² per event_type — one scan, O(groups) state."""
    ev = load_table(spark, sf_dir, "events")
    return group_linear_trend(ev).orderBy("event_type")


# ---------------------------------------------------------------------------
# Hourly series helpers (shared by ACF and CUSUM)
# ---------------------------------------------------------------------------


def hourly_series(
    df: DataFrame, key_col: str | None = None
) -> DataFrame:
    """Dense hourly count series (k?, h, c): one heavy scan collapses
    the corpus to O(hours) rows; missing hours are filled with c=0 over
    the [0, max_h] range (per key when ``key_col`` is given) so lag
    arithmetic sees a gap-free index. The fill uses a broadcast range —
    no second scan of the raw data."""
    spark = df.sparkSession
    if key_col is None:
        counts = df.select(hour_index().alias("h")).groupBy("h").agg(
            F.count(F.lit(1)).alias("c")
        )
        max_h = counts.agg(F.max("h")).collect()[0][0]
        if max_h is None:  # empty input: empty dense series
            return spark.createDataFrame([], "h long, c bigint")
        hours = spark.range(0, int(max_h) + 1).select(
            F.col("id").cast("long").alias("h")
        )
        return (
            hours.join(F.broadcast(counts), "h", "left")
            .select("h", F.coalesce("c", F.lit(0)).alias("c"))
        )
    counts = (
        df.select(F.col(key_col).alias("k"), hour_index().alias("h"))
        .groupBy("k", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    max_h = counts.agg(F.max("h")).collect()[0][0]
    if max_h is None:  # empty input: empty dense series (keep key dtype)
        ktype = df.schema[key_col].dataType.simpleString()
        return spark.createDataFrame([], f"k {ktype}, h long, c bigint")
    hours = spark.range(0, int(max_h) + 1).select(
        F.col("id").cast("long").alias("h")
    )
    keys = counts.select("k").distinct()
    grid = keys.crossJoin(F.broadcast(hours))
    return (
        grid.join(counts, ["k", "h"], "left")
        .select("k", "h", F.coalesce("c", F.lit(0)).alias("c"))
    )


def hourly_autocorr(df: DataFrame, max_lag: int = 24) -> DataFrame:
    """ACF of the corpus-wide hourly event count at lags 1..max_lag.
    Pearson r per lag over the aligned pairs (c_h, c_{h+lag}) — exact
    integer sums, one final float expression."""
    series = hourly_series(df).localCheckpoint(eager=True)
    spark = df.sparkSession
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = series.select(F.col("h").alias("ha"), F.col("c").alias("ca"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            series.select(
                F.col("h").alias("hb"), F.col("c").alias("cb")
            ),
            F.col("hb") == F.col("ha") + F.col("lag"),
        )
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ca").alias("sa"),
        F.sum("cb").alias("sb"),
        F.sum(F.col("ca") * F.col("ca")).alias("saa"),
        F.sum(F.col("ca") * F.col("cb")).alias("sab"),
        F.sum(F.col("cb") * F.col("cb")).alias("sbb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("sab") - d("sa") * d("sb")
    var_an = d("n") * d("saa") - d("sa") * d("sa")
    var_bn = d("n") * d("sbb") - d("sb") * d("sb")
    return s.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.when(
            (var_an > 0) & (var_bn > 0),
            F.round(cov_n / F.sqrt(var_an * var_bn), 6),
        ).alias("acf"),
    ).orderBy("lag")


def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is event traffic periodic? ACF of the hourly arrival count at
    lags 1..24 — the lag-24 spike is the daily seasonality signature."""
    ev = load_table(spark, sf_dir, "events")
    return hourly_autocorr(ev, max_lag=24)


def cusum_changepoints(
    df: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Per-group CUSUM mean-shift scan over the dense hourly series:
    S_h = Σ_{i<=h}(c_i - mean_k); the changepoint is the h maximizing
    |S_h| (earliest h on ties). Window running sums are evaluated
    left-to-right on both engines, so the double walk is bit-identical."""
    series = hourly_series(df, key_col)
    stats = series.groupBy("k").agg(
        F.sum("c").alias("tot"), F.count(F.lit(1)).alias("n_hours")
    )
    dense = series.join(F.broadcast(stats), "k")
    mean = F.col("tot").cast("double") / F.col("n_hours").cast("double")
    walk = Window.partitionBy("k").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = dense.select(
        "k",
        "h",
        "n_hours",
        F.col("tot").cast("double").alias("totd"),
        F.sum(F.col("c").cast("double") - mean).over(walk).alias("s"),
    )
    pick = Window.partitionBy("k").orderBy(
        F.abs(F.col("s")).desc(), F.col("h").asc()
    )
    return (
        cusum.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("k").alias("event_type"),
            F.col("h").alias("cp_hour"),
            F.round(F.col("s"), 4).alias("cusum_peak"),
            F.round(
                F.col("totd") / F.col("n_hours").cast("double"), 6
            ).alias("mean_per_hour"),
            F.col("n_hours"),
        )
        .orderBy("event_type")
    )


def q_events_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Where did each event type's hourly rate shift? CUSUM argmax per
    type over the dense hourly series."""
    ev = load_table(spark, sf_dir, "events")
    return cusum_changepoints(ev)


def hourly_crosscorr(
    df: DataFrame,
    key_a: str,
    key_b: str,
    max_lag: int = 6,
    key_col: str = "event_type",
) -> DataFrame:
    """Cross-correlation function between two groups' hourly count
    series at lags -max_lag..max_lag: Pearson r of (a_h, b_{h+lag}) —
    a positive-lag peak means ``key_a`` LEADS ``key_b`` (the
    lead/attribution question q_events_autocorr's single-series ACF
    can't answer).

    Same 100-TB shape as the ACF: one heavy scan collapses the corpus
    to the two dense O(hours) series; every lag is then a broadcast
    join on that tiny relation. All sums are exact integers; Pearson r
    is one final pinned double expression, rounded."""
    spark = df.sparkSession
    series = hourly_series(
        df.filter(F.col(key_col).isin(key_a, key_b)), key_col
    ).localCheckpoint(eager=True)
    a = series.filter(F.col("k") == key_a).select(
        F.col("h").alias("ha"), F.col("c").alias("ca")
    )
    b = series.filter(F.col("k") == key_b).select(
        F.col("h").alias("hb"), F.col("c").alias("cb")
    )
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    pairs = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("hb") == F.col("ha") + F.col("lag")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ca").alias("sa"),
        F.sum("cb").alias("sb"),
        F.sum(F.col("ca") * F.col("ca")).alias("saa"),
        F.sum(F.col("ca") * F.col("cb")).alias("sab"),
        F.sum(F.col("cb") * F.col("cb")).alias("sbb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("sab") - d("sa") * d("sb")
    var_an = d("n") * d("saa") - d("sa") * d("sa")
    var_bn = d("n") * d("sbb") - d("sb") * d("sb")
    return s.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.when(
            (var_an > 0) & (var_bn > 0),
            F.round(cov_n / F.sqrt(var_an * var_bn), 6),
        ).alias("ccf"),
    ).orderBy("lag")


def q_events_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do clicks lead purchases? CCF between the click and purchase
    hourly series at lags -6..6."""
    ev = load_table(spark, sf_dir, "events")
    return hourly_crosscorr(ev, "click", "purchase", max_lag=6)


def seasonal_anomalies(
    df: DataFrame,
    key_col: str = "event_type",
    period: int = 24,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` seasonal anomalies: hours whose count deviates
    most from the group's hour-of-day baseline, by |z| against the
    (group, h mod period) cell's own mean/std over the dense series.

    The 100-TB shape: one scan to the dense per-group hourly series
    (zero-filled, so quiet hours are anomalies too), baseline stats as
    a groupBy over that O(groups·hours) relation, z-scores as a
    broadcast join back — no window over raw rows, no second scan.

    Determinism: per-cell (n, Σc, Σc²) are exact integers;
    z = (n·c − s) / sqrt(n·ss − s²) is one pinned double expression
    (the population-σ form scaled by n — identical ranking to the
    classic z, with no mean/std intermediates to diverge); ties break
    (k, h). Cells with zero variance are excluded (a constant cell has
    no anomaly scale)."""
    series = hourly_series(df, key_col).localCheckpoint(eager=True)
    cells = series.groupBy(
        "k", (F.col("h") % period).alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    scored = (
        series.withColumn("hod", F.col("h") % period)
        .join(F.broadcast(cells), ["k", "hod"])
        .filter(
            F.col("n") * F.col("ss") - F.col("s") * F.col("s") > 0
        )
        .select(
            F.col("k").alias(key_col),
            "h",
            "c",
            F.round(d("s") / d("n"), 6).alias("expected"),
            F.round(
                (d("n") * d("c") - d("s"))
                / F.sqrt(d("n") * d("ss") - d("s") * d("s")),
                6,
            ).alias("z"),
        )
    )
    return scored.orderBy(
        F.abs(F.col("z")).desc(), key_col, "h"
    ).limit(top_n)


def q_events_seasonal_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Which hours broke their type's daily rhythm? Top-20 hourly
    counts by |z| against the (type, hour-of-day) baseline."""
    ev = load_table(spark, sf_dir, "events")
    return seasonal_anomalies(ev)


def theil_sen_trend(
    df: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Theil-Sen robust trend per group: the MEDIAN of all pairwise
    slopes (c_j - c_i)/(h_j - h_i) over the dense hourly count series
    — the estimator that shrugs off the outlier hours that drag OLS
    (``group_linear_trend``) around; 29.3% breakdown point.

    100-TB shape: the corpus collapses to the O(hours) series in one
    scan; the pairwise self-join is O(hours²) per group on that TINY
    relation — independent of corpus row count, so the operator is as
    flat as the ACF. The median is the pinned rank rule (max(1,
    ceil(n/2)) over the slope-ordered pairs) — the value at that rank
    is deterministic under ties regardless of engine sort order.
    Slopes are single IEEE divisions of exact integer differences, so
    both engines rank identical doubles."""
    series = hourly_series(df, key_col).localCheckpoint(eager=True)
    a = series.select(
        "k", F.col("h").alias("ha"), F.col("c").alias("ca")
    )
    b = series.select(
        "k", F.col("h").alias("hb"), F.col("c").alias("cb")
    )
    slopes = (
        a.join(b, "k")
        .filter(F.col("hb") > F.col("ha"))
        .select(
            "k",
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("hb") - F.col("ha")).cast("double")
            ).alias("slope"),
        )
    )
    # Counter-form rank selection (the equidepth-histogram pattern):
    # collapse the O(hours²) slope multiset to (k, slope, count) with a
    # parallel partial aggregation — measured 1.29M -> 79k rows at
    # sf0.1 — so the per-key window sorts the DISTINCT slopes, not
    # every pair. The old row_number ran one single-task sort of the
    # full multiset per key (5 tasks total at any core count — the
    # round-10 scaling-ratio smell). The value at the pinned rank
    # max(1, ceil(n/2)) is unchanged: the first distinct slope whose
    # running count reaches the rank IS the rank-th element of the
    # sorted multiset, ties collapsing to the same value by definition.
    grouped = slopes.groupBy("k", "slope").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("k").orderBy("slope")
    ranked = grouped.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n",
        F.sum("c").over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    target = F.greatest(F.lit(1), F.ceil(F.col("n") * 0.5).cast("int"))
    return (
        ranked.filter(
            (F.col("cum") >= target)
            & (F.col("cum") - F.col("c") < target)
        )
        .select(
            F.col("k").alias(key_col),
            F.col("n").alias("n_pairs"),
            F.round(F.col("slope"), 6).alias("sen_slope_per_hour"),
        )
        .orderBy(key_col)
    )


def q_events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust hourly-rate trend per event type — the median-of-slopes
    answer to the same question q_events_linear_trend asks with OLS."""
    ev = load_table(spark, sf_dir, "events")
    return theil_sen_trend(ev)
