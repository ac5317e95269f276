"""2-D skyline (Pareto frontier) — the preference-query operator
(Börzsönyi et al., "The Skyline Operator", ICDE'01): rows not
dominated by any other row, where p dominates q iff p >= q on both
dimensions and > on at least one. North-star family the reference has
no counterpart for (its analytics stop at frequency/top-k).

Scale shape (both dimensions integer-valued, maximize-maximize):

1. Collapse to the per-x maximum: ``groupBy(x).agg(max(y))`` — any
   row below its x-group's max is dominated by that max (same x,
   strictly higher y), so only group maxima can survive. One hash
   aggregate; this is also the big data reduction (|distinct x| rows
   remain).
2. The survivor test on the collapsed relation M is ``y > max{y' :
   x' > x}`` — a strict-suffix maximum in x order. Computed with the
   same two-phase scheme as ``plans/ordering.with_global_cumsum``:
   value-derived quantile buckets on x, a PER-BUCKET window
   (``ORDER BY x DESC RANGE BETWEEN UNBOUNDED PRECEDING AND 1
   PRECEDING`` — the range frame excludes equal x, giving exact
   strict domination), and a broadcast per-bucket suffix-max for the
   cross-bucket contribution. No single-partition window ever sees
   the collapsed relation; bucket boundaries only affect grouping,
   never the result.
3. Join survivors back on (x, y) to recover every input row sitting
   on a frontier point (equal points don't dominate each other).

Parity: all comparisons are on exact integers (callers quantize money
to cents first), so the frontier is engine-exact; the DuckDB oracle
uses the independent NOT EXISTS dominance formulation, cross-checking
the bucketed plan row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table


def skyline2d_points(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distinct Pareto-frontier points (x, y), maximizing both integer
    dimensions; with ``group_cols``, one independent frontier per
    group (dominance never crosses groups). See module docstring for
    the plan shape — groups simply extend every partitioning key."""
    groups = list(group_cols or [])
    spark = df.sparkSession
    if num_partitions is None:
        # shuffle.partitions may be non-numeric on some deployments
        # (e.g. "auto" under Databricks AQE) — degrade to a fixed
        # bucket count rather than raising.
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except (TypeError, ValueError):
            num_partitions = 32
    m = df.groupBy(*groups, x_col).agg(F.max(y_col).alias(y_col))
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = (
        sorted(set(m.approxQuantile(x_col, probs, 0.001))) if probs else []
    )
    if bounds:
        bounds_arr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(bounds_arr, lambda b: b < F.col(x_col)))
    else:
        bucket = F.lit(0)
    bucketed = m.withColumn("_bkt", bucket)
    # strict within-bucket suffix max: equal x excluded by the range
    # frame (verified semantics: DESC order + [unbounded, -1] sees
    # only x' > x)
    w = (
        Window.partitionBy(*groups, "_bkt")
        .orderBy(F.col(x_col).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("_above", F.max(y_col).over(w))
    # cross-bucket strict suffix max: buckets ascend with x, so the
    # contribution for bucket b is max(y) over buckets > b. One row per
    # (group, quantile bucket) — bounded by construction (same argument
    # as ordering.py's offsets window).
    bmax = bucketed.groupBy(*groups, "_bkt").agg(
        F.max(y_col).alias("_bmax")
    )
    off_w = (
        Window.partitionBy(*groups)
        .orderBy(F.col("_bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ext = bmax.select(
        *groups, "_bkt", F.max("_bmax").over(off_w).alias("_ext")
    )
    # greatest() skips nulls (null only when BOTH miss: top bucket's
    # max-x rows)
    dominator = F.greatest(F.col("_above"), F.col("_ext"))
    return (
        local.join(F.broadcast(ext), [*groups, "_bkt"])
        .filter(dominator.isNull() | (F.col(y_col) > dominator))
        .select(*groups, x_col, y_col)
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    num_partitions: int | None = None,
    x_dir: str = "max",
    y_dir: str = "max",
) -> DataFrame:
    """Every input row lying on the (per-group) Pareto frontier (equal
    points don't dominate each other, so co-located rows all survive).

    ``x_dir``/``y_dir`` choose the preference per dimension ("max" or
    "min"): minimizing a dimension is the same frontier on its
    negation, so both directions reduce to the maximize-maximize core
    without touching the plan shape.
    """
    for d in (x_dir, y_dir):
        if d not in ("max", "min"):
            raise ValueError(f"direction must be 'max' or 'min', got {d!r}")
    groups = list(group_cols or [])
    work = df
    nx, ny = x_col, y_col
    if x_dir == "min":
        nx = f"_neg_{x_col}"
        work = work.withColumn(nx, -F.col(x_col))
    if y_dir == "min":
        ny = f"_neg_{y_col}"
        work = work.withColumn(ny, -F.col(y_col))
    pts = skyline2d_points(work, nx, ny, groups, num_partitions)
    return work.join(F.broadcast(pts), [*groups, nx, ny]).drop(
        *[c for c in (nx, ny) if c not in (x_col, y_col)]
    )


def q_customer_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal customers over (total spend, order count): no
    other customer spends at least as much AND orders at least as
    often with one strict. Money quantized to exact integer cents
    before the frontier test."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.count(F.lit(1)).alias("order_count"),
    )
    sky = skyline2d(per_cust, "cents", "order_count")
    return sky.select(
        "custkey",
        (F.col("cents") / 100.0).alias("total_spent"),
        "order_count",
    ).orderBy(F.desc("total_spent"), "custkey")


def q_segment_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment Pareto frontier over (total spend, order
    count): the grouped skyline — dominance never crosses segments."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.round(F.sum("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .join(F.broadcast(cust), "custkey")
    )
    sky = skyline2d(per_cust, "cents", "order_count", ["c_mktsegment"])
    return sky.select(
        "c_mktsegment",
        "custkey",
        (F.col("cents") / 100.0).alias("total_spent"),
        "order_count",
    ).orderBy("c_mktsegment", F.desc("total_spent"), "custkey")
