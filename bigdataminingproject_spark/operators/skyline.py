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
from bigdataminingproject_spark.functions.lits import lit_array
from pyspark.sql.window import Window

from bigdataminingproject_spark.session import shuffle_partitions
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
        num_partitions = shuffle_partitions(spark)
    m = df.groupBy(*groups, x_col).agg(F.max(y_col).alias(y_col))
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = (
        sorted(set(m.approxQuantile(x_col, probs, 0.001))) if probs else []
    )
    if bounds:
        bounds_arr = lit_array([float(b) for b in bounds])
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


def _skyline_mask(arr):
    """Exact skyline of an (n, d) integer ndarray, maximizing every
    column; returns a boolean keep-mask aligned to ``arr``'s rows.

    SFS order (Chomicki et al., "Skyline with Presorting", ICDE'03):
    scan in descending dimension-sum order. Domination implies a
    strictly larger sum (>= on all dims, > on one, integers), so every
    dominator of a point precedes it in the scan and checking each
    point against the KEPT set alone is exact (transitivity lifts
    "dominated by anything" to "dominated by a kept skyline point").
    Equal-sum points can never dominate each other, so ties need no
    secondary key. The inner check is a vectorized numpy compare
    against the kept block — O(n * s) with s = skyline size, the
    block-nested-loop bound."""
    import numpy as np

    n = arr.shape[0]
    keep = np.zeros(n, dtype=bool)
    order = np.argsort(arr.sum(axis=1), kind="stable")[::-1]
    kept_rows: list = []
    for idx in order:
        p = arr[idx]
        if kept_rows:
            k = np.array(kept_rows)
            if bool(((k >= p).all(axis=1) & (k > p).any(axis=1)).any()):
                continue
        kept_rows.append(p)
        keep[idx] = True
    return keep


def skyline_nd_points(
    df: DataFrame,
    dim_cols: list[str],
    group_cols: list[str] | None = None,
    dirs: list[str] | None = None,
) -> DataFrame:
    """Distinct d-dimensional (per-group) Pareto-frontier points for
    integer dimensions, d >= 2 — the generalization the 2-D
    per-x-collapse trick can't reach (VERDICT r4 #8).

    Two-phase distributed BNL, the MR-skyline shape:

    1. **Collapse** ``groupBy(dims[:-1]).agg(max(dims[-1]))`` — a row
       below its leading-combo's max on the last dim is dominated by
       that max. One hash aggregate, the big data reduction.
    2. **Local skylines** (``mapInPandas``): each Arrow batch of the
       collapsed relation drops its locally dominated points — safe
       because domination is transitive, so a batch's skyline is a
       superset of its contribution to the global one. Map-only, no
       shuffle; output per batch is the batch's skyline.
    3. **Global skyline** (``applyInPandas`` keyed on the group
       columns): the surviving candidates — typically
       skyline-sized, NOT corpus-sized — meet once per group for the
       exact SFS pass. For the global (ungrouped) frontier this is one
       task over the candidate set, the standard final-reducer bound
       of two-phase MR-BNL; candidate cardinality is the union of
       batch skylines (~O(#batches x E[skyline]), sub-linear for
       independent/correlated dims). The known worst case —
       anti-correlated dimensions where the skyline itself is O(n) —
       degenerates in ANY skyline algorithm; grid/angular partitioning
       of phase 3 is the published escape hatch and would slot in as a
       pre-bucketing of the candidates.

    ``dirs`` gives a per-dimension "max"/"min" preference (default all
    max); minimized dims ride through negation like ``skyline2d``.
    Parity: integer dims only, so the frontier is engine-exact against
    a NOT EXISTS oracle.
    """
    import pandas as pd

    if len(dim_cols) < 2:
        raise ValueError("skyline needs >= 2 dimensions")
    groups = list(group_cols or [])
    dirs = list(dirs or ["max"] * len(dim_cols))
    if len(dirs) != len(dim_cols):
        raise ValueError("dirs must match dim_cols")
    for d in dirs:
        if d not in ("max", "min"):
            raise ValueError(f"direction must be 'max' or 'min', got {d!r}")
    work_cols = []
    proj = []
    for c, d in zip(dim_cols, dirs):
        if d == "min":
            wc = f"_neg_{c}"
            proj.append((-F.col(c)).alias(wc))
        else:
            wc = c
            proj.append(F.col(c))
        work_cols.append(wc)
    work = df.select(*groups, *proj)
    lead, last = work_cols[:-1], work_cols[-1]
    collapsed = work.groupBy(*groups, *lead).agg(F.max(last).alias(last))
    schema = collapsed.schema

    def local_skyline(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if groups:
                out = []
                for _, g in pdf.groupby(groups, sort=False):
                    arr = g[work_cols].to_numpy()
                    out.append(g[_skyline_mask(arr)])
                yield pd.concat(out)
            else:
                arr = pdf[work_cols].to_numpy()
                yield pdf[_skyline_mask(arr)]

    candidates = collapsed.mapInPandas(local_skyline, schema=schema)

    def global_skyline(pdf):
        arr = pdf[work_cols].to_numpy()
        return pdf[_skyline_mask(arr)]

    if groups:
        pts = candidates.groupBy(*groups).applyInPandas(
            global_skyline, schema=schema
        )
    else:
        # derived grouping keys aren't part of the pandas batch, so the
        # schema/columns pass through unchanged
        pts = candidates.groupBy(F.lit(1).alias("_g")).applyInPandas(
            global_skyline, schema=schema
        )
    # undo negation so callers see original dimension values
    restore = [
        (-F.col(f"_neg_{c}")).alias(c) if d == "min" else F.col(c)
        for c, d in zip(dim_cols, dirs)
    ]
    return pts.select(*groups, *restore)


def skyline_nd(
    df: DataFrame,
    dim_cols: list[str],
    group_cols: list[str] | None = None,
    dirs: list[str] | None = None,
) -> DataFrame:
    """Every input row lying on the (per-group) d-dimensional Pareto
    frontier — ``skyline_nd_points`` joined back on all dimensions, so
    co-located rows all survive (equal points don't dominate)."""
    groups = list(group_cols or [])
    pts = skyline_nd_points(df, dim_cols, group_cols, dirs)
    return df.join(F.broadcast(pts), [*groups, *dim_cols], "left_semi")


def q_segment_rfm_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment 3-D RFM skyline (VERDICT r4 #8 stretch):
    customers Pareto-optimal on Recency (latest order date), Frequency
    (order count), and Monetary (total spend, integer cents) — the
    classic RFM triple, maximized jointly within each segment. All
    three dims are exact integers (days / count / cents), so the
    frontier matches the independent NOT EXISTS DuckDB oracle
    row-for-row."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.unix_date(F.max(F.col("o_orderdate").cast("date"))).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
        .join(F.broadcast(cust), "custkey")
    )
    sky = skyline_nd(
        per_cust,
        ["recency_days", "frequency", "cents"],
        ["c_mktsegment"],
    )
    return sky.select(
        "c_mktsegment",
        "custkey",
        F.date_from_unix_date("recency_days").alias("last_order"),
        "frequency",
        (F.col("cents") / 100.0).alias("total_spent"),
    ).orderBy("c_mktsegment", F.desc("total_spent"), "custkey")
