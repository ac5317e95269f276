"""Equi-depth histograms and histogram-based selectivity estimation.

The optimizer-statistics family so far prices equi-joins with CMS
inner products (operators/sketches.py::q_join_size_estimate) and range
scans with q-digest rank differences (operators/qdigest.py). This
module adds the statistic every production optimizer actually ships:
the EQUI-DEPTH HISTOGRAM (Piatetsky-Shapiro & Connell, SIGMOD '84 —
the System R/Selinger lineage), whose bucket boundaries are exact
order statistics of the column.

Plan shape: boundaries come from the shared exact-selection descent
(operators/selection.py — O(log N) scans, driver state O(buckets)
floats, never rows), then ONE scan buckets every value by comparing
against the broadcast boundary list. No sort, no per-value state: the
scan side is a whole-stage-codegen sum of ``v > boundary`` flags.
Equi-depth (not equi-width) is the scale-robust choice: skewed columns
concentrate mass in few equi-width cells, while equi-depth boundaries
adapt so every bucket prices ~1/B of the rows regardless of skew.

Selectivity estimation then does what a cost model does with the
histogram: full buckets inside the predicate range count exactly,
partial buckets interpolate linearly (uniform-within-bucket
assumption) — and the operator reports estimate AND measured truth so
the error of that assumption is attested, not asserted.

Cross-engine determinism: boundaries are exact selected VALUES (bit-
identical on any engine via the pinned rank rule), bucket membership
is a pure comparison against them, and the estimate's 8-term float
fold is order-pinned left-to-right on both engines (Python loop here;
a cumulative window sum in the oracle) so not even an ulp of
reassociation can diverge.

No reference counterpart (the reference has no statistics surface);
north-star OLAP family alongside qdigest.py and sketches.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.selection import exact_quantiles
from bigdataminingproject_spark.sources.tables import load_table

HIST_BUCKETS = 8


def equidepth_histogram(
    df: DataFrame, col: str, buckets: int = HIST_BUCKETS
) -> DataFrame:
    """Exact equi-depth histogram of ``df[col]``: ``buckets`` rows
    (bucket, lo, hi, n_rows) where the interior boundaries are the
    exact i/B order statistics and n_rows is the exact population of
    each (lo, hi] cell (first cell is [min, b_1]).

    Bucket rule: bucket(v) = 1 + #{boundaries b_i : v > b_i} — ties on
    a boundary land LOW, so the rule is a pure function of (v,
    boundaries) with no rank arithmetic in the scan. Heavy ties can
    legitimately empty a bucket (duplicate boundaries); empty buckets
    are emitted with n_rows = 0 so the histogram always has exactly
    ``buckets`` rows.
    """
    spark = df.sparkSession
    out_schema = "bucket int, lo double, hi double, n_rows bigint"
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    g = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    if g["lo"] is None:
        return spark.createDataFrame([], out_schema)
    qs = tuple(i / buckets for i in range(1, buckets))
    # one bounds aggregate serves both this spec and the descent
    qdf = exact_quantiles(
        df, col, qs=qs, stats=(g["n"], g["lo"], g["hi"])
    )
    bmap = {float(r["q"]): float(r["value"]) for r in qdf.collect()}
    bs = [bmap[i / buckets] for i in range(1, buckets)]
    edges = [float(g["lo"])] + bs + [float(g["hi"])]
    bucket = reduce(
        lambda acc, b: acc
        + F.when(F.col("v") > F.lit(b), F.lit(1)).otherwise(F.lit(0)),
        bs,
        F.lit(1),
    )
    counts = (
        vals.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spec = spark.createDataFrame(
        [(i + 1, edges[i], edges[i + 1]) for i in range(buckets)],
        "bucket int, lo double, hi double",
    )
    return (
        spec.join(counts, "bucket", "left")
        .select(
            "bucket",
            "lo",
            "hi",
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        )
        .orderBy("bucket")
    )


def _interp_est(hist_rows: list, lo: float, hi: float) -> float:
    """Driver-side interpolation fold, left-to-right in bucket order
    (the oracle's cumulative window sum replays the identical op
    sequence). hist_rows: (bucket, lo, hi, n_rows) sorted by bucket."""
    est = 0.0
    for r in hist_rows:
        blo, bhi, n = float(r["lo"]), float(r["hi"]), int(r["n_rows"])
        if bhi < lo or blo > hi or n == 0:
            continue
        if blo == bhi:  # collapsed (heavy-tie) bucket: all-or-nothing
            est = est + float(n)
            continue
        frac = (min(hi, bhi) - max(lo, blo)) / (bhi - blo)
        frac = min(1.0, max(0.0, frac))
        est = est + float(n) * frac
    return est


def histogram_selectivity(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    buckets: int = HIST_BUCKETS,
) -> DataFrame:
    """One row (range_lo, range_hi, est_rows, exact_rows, err_pct):
    the equi-depth-histogram estimate of ``count(col BETWEEN lo AND
    hi)`` under the uniform-within-bucket assumption, next to the
    measured truth. Same output shape as the q-digest range estimator
    (qdigest.q_events_range_selectivity) so the two statistics are
    directly comparable. est_rows is floor(est + 0.5) of the order-
    pinned interpolation fold."""
    spark = df.sparkSession
    hist = equidepth_histogram(df, col, buckets).collect()  # B rows
    est = _interp_est(hist, lo, hi)
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    exact = vals.filter(
        (F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi))
    ).count()
    import math

    est_rows = int(math.floor(est + 0.5))
    err_pct = (
        math.floor(abs(est_rows - exact) * 100.0 * 100.0 / exact + 0.5)
        / 100.0
        if exact
        else 0.0
    )
    return spark.createDataFrame(
        [(float(lo), float(hi), est_rows, int(exact), float(err_pct))],
        "range_lo double, range_hi double, est_rows bigint, "
        "exact_rows bigint, err_pct double",
    )


def q_events_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bucket exact equi-depth histogram of events.value — the
    optimizer-statistics build side."""
    ev = load_table(spark, sf_dir, "events")
    return equidepth_histogram(ev, "value", HIST_BUCKETS)


def q_events_hist_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram estimate vs measured truth for ``value BETWEEN 20 AND
    100`` — the probe side (same predicate family as the q-digest
    estimator, so the two statistics' errors are comparable)."""
    ev = load_table(spark, sf_dir, "events")
    return histogram_selectivity(ev, "value", 20.0, 100.0, HIST_BUCKETS)


# ---------------------------------------------------------------------------
# Counter-form state (the streaming twin's mergeable representation)
# ---------------------------------------------------------------------------


def value_counters(df: DataFrame, col: str) -> DataFrame:
    """Exact distribution state as (v, c) counters — one row per
    DISTINCT value, closed under per-value addition. For bounded-
    cardinality columns (2-dp money/metric scales, enums, small-int
    measures) this is the exact histogram state a streaming view
    maintains: state size tracks the VALUE DOMAIN, not the corpus.
    (A truly continuous column would cap distinct values near N; that
    regime belongs to the q-digest sketch twin instead.)"""
    return (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def fold_value_counters(parts: DataFrame) -> DataFrame:
    """LSM merge-operator: stacked (v, c) partials collapse by
    per-value integer addition."""
    return parts.groupBy("v").agg(F.sum("c").alias("c"))


def equidepth_from_counters(
    counters: DataFrame, buckets: int = HIST_BUCKETS
) -> DataFrame:
    """Rebuild the EXACT equi-depth histogram from folded (v, c)
    counters — bit-identical to ``equidepth_histogram`` on the raw
    rows, because every ingredient is recoverable exactly:

      * boundary at q = value at ascending rank max(1, ceil(q·N))
        (the pinned exact-selection rank rule) = smallest v whose
        cumulative count reaches the rank;
      * bucket membership = the same Σ(v > boundary) flag expression,
        weighted by c instead of evaluated per row.

    The cumulative walk runs on the counter relation (O(domain) rows,
    a publish-time window over bounded state — not a corpus sort)."""
    import math as _math

    from pyspark.sql.window import Window as _W

    spark = counters.sparkSession
    out_schema = "bucket int, lo double, hi double, n_rows bigint"
    g = counters.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum("c").alias("n"),
    ).collect()[0]
    if g["lo"] is None:
        return spark.createDataFrame([], out_schema)
    total = int(g["n"])
    cum = counters.withColumn(
        "cum",
        F.sum("c").over(
            _W.orderBy("v").rowsBetween(_W.unboundedPreceding, 0)
        ),
    ).localCheckpoint(eager=True)
    ranks = spark.createDataFrame(
        [
            (i, max(1, _math.ceil(i / buckets * total)))
            for i in range(1, buckets)
        ],
        "i int, r bigint",
    )
    brows = (
        F.broadcast(ranks)
        .join(cum, F.col("cum") >= F.col("r"))
        .groupBy("i")
        .agg(F.min("v").alias("b"))
        .collect()
    )
    bmap = {int(row["i"]): float(row["b"]) for row in brows}
    bs = [bmap[i] for i in range(1, buckets)]
    edges = [float(g["lo"])] + bs + [float(g["hi"])]
    bucket = reduce(
        lambda acc, b: acc
        + F.when(F.col("v") > F.lit(b), F.lit(1)).otherwise(F.lit(0)),
        bs,
        F.lit(1),
    )
    counts = (
        counters.groupBy(bucket.alias("bucket"))
        .agg(F.sum("c").alias("n_rows"))
    )
    spec = spark.createDataFrame(
        [(i + 1, edges[i], edges[i + 1]) for i in range(buckets)],
        "bucket int, lo double, hi double",
    )
    return (
        spec.join(counts, "bucket", "left")
        .select(
            "bucket",
            "lo",
            "hi",
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        )
        .orderBy("bucket")
    )
