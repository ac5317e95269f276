"""Column-dependence profiling: mutual information between columns
and functional-dependency (FD) discovery metrics — the Metanome /
data-profiling family.

No reference counterpart (SURVEY.md §2 has no profiling surface);
these are the operators a 100-TB data catalog runs to decide join
keys, detect denormalization, and rank feature columns:

- ``mutual_information``: MI (and normalized MI) between two discrete
  columns from the exact contingency counts. One hash-agg scan to
  O(|X|·|Y|) cells, then the information fold happens on that tiny
  relation. All counts are exact bigints; ln() enters only in the
  final per-cell expression (the repo's NLL precedent), rounded.
- ``fd_profile``: for candidate determinant→dependent pairs, the
  exact violation metrics: #distinct determinants, #distinct
  (det, dep) pairs (FD holds iff equal), and the g3 error — the
  minimum number of rows to delete for the FD to hold
  (Kivinen & Mannila '95), computed distributed as
  N - Σ_det max_dep count(det, dep): two stacked hash aggregations,
  no row ever leaves the executors.

Scale shape: every metric is aggregation-only (no joins, no windows
over raw rows); candidate pairs each cost one column-pruned scan —
at cluster scale you'd stack them over one cached projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.trends import hour_index
from bigdataminingproject_spark.sources.tables import load_table


def contingency_cells(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """Exact contingency counts (x, y, nxy) — the sufficient state for
    every information metric below. Closed under per-cell addition
    (the streaming twin folds exactly these counters), bounded by
    |X|·|Y| regardless of corpus size.

    NULL-keyed rows are excluded HERE so that N, the margins, and the
    joined cell sum all cover the same population — an inner join on
    x/y can never match a NULL cell, so admitting NULL cells would
    make the statistics internally inconsistent (they'd inflate N and
    the margin entropies while silently dropping out of the MI/chi2
    sums). The oracle SQL applies the same IS NOT NULL rule."""
    return (
        df.select(x.alias("x"), y.alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )


def mi_from_cells(cells: DataFrame) -> DataFrame:
    """One row (n_rows, h_x, h_y, mi_nats, nmi) from a contingency-cell
    relation (x, y, nxy): exact-count entropies H(X), H(Y), mutual
    information I(X;Y) in nats, and the sqrt-normalized
    NMI = I / sqrt(H(X)·H(Y)).

    Identity used (integer-count form, one ln per cell/margin):
      H(X)  = ln N - Σ_x n_x ln n_x / N
      I     = Σ_xy (n_xy/N) ln(N·n_xy / (n_x·n_y))
    """
    cells = cells.localCheckpoint(eager=True)
    spark = cells.sparkSession
    mx = cells.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = cells.agg(F.sum("nxy").alias("n")).collect()[0]["n"]
    if tot is None:  # empty cell relation
        return spark.createDataFrame(
            [],
            "n_rows bigint, h_x double, h_y double, "
            "mi_nats double, nmi double",
        )
    nd = F.lit(float(tot))
    joined = cells.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
    mi = joined.agg(
        F.sum(
            (F.col("nxy").cast("double") / nd)
            * F.log(
                nd
                * F.col("nxy").cast("double")
                / (F.col("nx").cast("double") * F.col("ny").cast("double"))
            )
        ).alias("mi")
    )
    hx = mx.agg(
        (
            F.log(nd)
            - F.sum(
                F.col("nx").cast("double")
                * F.log(F.col("nx").cast("double"))
            )
            / nd
        ).alias("h")
    ).collect()[0]["h"]
    hy = my.agg(
        (
            F.log(nd)
            - F.sum(
                F.col("ny").cast("double")
                * F.log(F.col("ny").cast("double"))
            )
            / nd
        ).alias("h")
    ).collect()[0]["h"]
    denom = (float(hx) * float(hy)) ** 0.5
    return mi.select(
        F.lit(int(tot)).cast("bigint").alias("n_rows"),
        F.round(F.lit(float(hx)), 6).alias("h_x"),
        F.round(F.lit(float(hy)), 6).alias("h_y"),
        F.round(F.col("mi"), 6).alias("mi_nats"),
        (
            F.round(F.col("mi") / F.lit(denom), 6)
            if denom > 0
            else F.lit(None).cast("double")
        ).alias("nmi"),
    )


def mutual_information(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """MI profile of two columns: contingency counts, then the
    information fold on that tiny relation."""
    return mi_from_cells(contingency_cells(df, x, y))


def fold_contingency_cells(parts: DataFrame) -> DataFrame:
    """LSM merge-operator: stacked cell partials collapse by per-cell
    integer addition."""
    return parts.groupBy("x", "y").agg(F.sum("nxy").alias("nxy"))


def q_events_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does knowing the event type tell you about WHEN it
    happens? MI between event_type and UTC hour-of-day (0-23)."""
    ev = load_table(spark, sf_dir, "events")
    return mutual_information(
        ev, F.col("event_type"), hour_index() % F.lit(24)
    )


def fd_profile(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Exact FD-discovery metrics for each candidate det→dep pair:

      n_rows, n_det (distinct determinants), n_pairs (distinct
      det,dep combos), holds (n_pairs == n_det), g3_rows (min row
      deletions for the FD to hold), g3_err (g3_rows / n_rows).

    g3 via two stacked aggregations: count per (det, dep), max per
    det, then N - Σ max."""
    if not pairs:
        return df.sparkSession.createDataFrame(
            [],
            "determinant string, dependent string, n_rows bigint, "
            "n_det bigint, n_pairs bigint, holds boolean, "
            "g3_rows bigint, g3_err double",
        )
    outs = []
    for det, dep in pairs:
        cnt = (
            df.select(F.col(det).alias("d"), F.col(dep).alias("e"))
            .groupBy("d", "e")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        per_det = cnt.groupBy("d").agg(
            F.max("c").alias("keep"),
            F.sum("c").alias("rows"),
            F.count(F.lit(1)).alias("combos"),
        )
        agg = per_det.agg(
            F.sum("rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_det"),
            F.sum("combos").alias("n_pairs"),
            (F.sum("rows") - F.sum("keep")).alias("g3_rows"),
        )
        outs.append(
            agg.select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_rows",
                "n_det",
                "n_pairs",
                (F.col("n_pairs") == F.col("n_det")).alias("holds"),
                "g3_rows",
                F.round(
                    F.col("g3_rows").cast("double")
                    / F.col("n_rows").cast("double"),
                    6,
                ).alias("g3_err"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("determinant", "dependent")


ORDERS_FD_CANDIDATES = [
    ("o_orderkey", "o_custkey"),      # key -> anything: holds
    ("o_custkey", "o_orderstatus"),   # violated: customers mix statuses
    ("o_custkey", "o_orderpriority"),  # violated: customers mix priorities
    ("o_orderdate", "o_orderstatus"),  # violated: dates mix statuses
]


def q_orders_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which candidate FDs hold on orders, and how badly do the rest
    fail? Exact g3 violation metrics for four canonical candidates."""
    orders = load_table(spark, sf_dir, "orders")
    return fd_profile(orders, ORDERS_FD_CANDIDATES)


# ---------------------------------------------------------------------------
# Distribution drift (PSI) and independence testing (chi-square)
# ---------------------------------------------------------------------------

PSI_BUCKETS = 10
PSI_SPLIT_HOUR = 360  # Jan 1-15 reference / Jan 16+ current
PSI_SMOOTH = 0.5  # Laplace half-count per bucket (pinned rule)


def psi_drift(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    split_hour: int = PSI_SPLIT_HOUR,
    buckets: int = PSI_BUCKETS,
) -> DataFrame:
    """Population Stability Index per group — the ML-ops drift metric:
    bucket the CURRENT window's values into the REFERENCE window's
    exact equi-depth deciles and fold Σ (p_c - p_r)·ln(p_c/p_r).

    Decile boundaries are exact order statistics of the reference
    window (the shared selection descent — O(log N) scans, no sort);
    bucketing is the same broadcast Σ(v > boundary) flag expression
    the histogram family uses; both halves' bucket counts are exact
    integers with Laplace +0.5 smoothing (pinned, so empty buckets
    stay finite and engines agree bit-for-bit before the 6 dp round).

    PSI rule-of-thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 major.
    """
    from functools import reduce

    from bigdataminingproject_spark.operators.selection import (
        exact_quantiles,
    )
    from bigdataminingproject_spark.operators.trends import hour_index

    spark = df.sparkSession
    base = df.select(
        F.col(key_col).alias("k"),
        hour_index().alias("h"),
        F.col(val_col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("k").isNotNull())
    ref = base.filter(F.col("h") < split_hour)
    cur = base.filter(F.col("h") >= split_hour)
    qs = tuple(i / buckets for i in range(1, buckets))
    qdf = exact_quantiles(ref, "v", qs=qs)
    bmap = {float(r["q"]): float(r["value"]) for r in qdf.collect()}
    if not bmap:  # empty reference window: no deciles, no report
        ktype = df.schema[key_col].dataType.simpleString()
        return spark.createDataFrame(
            [],
            f"{key_col} {ktype}, n_ref bigint, n_cur bigint, psi double",
        )
    bs = [bmap[i / buckets] for i in range(1, buckets)]
    bucket = reduce(
        lambda acc, b: acc
        + F.when(F.col("v") > F.lit(b), F.lit(1)).otherwise(F.lit(0)),
        bs,
        F.lit(1),
    )

    def _counts(half: DataFrame, name: str) -> DataFrame:
        return (
            half.groupBy(F.col("k"), bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    rcnt = _counts(ref, "cr").localCheckpoint(eager=True)
    ccnt = _counts(cur, "cc").localCheckpoint(eager=True)
    # key universe from the (tiny, already-aggregated) count relations
    # — no third scan of the raw rows
    keys = (
        rcnt.select("k").unionByName(ccnt.select("k")).distinct()
    )
    grid = keys.crossJoin(
        F.broadcast(
            spark.range(1, buckets + 1).select(
                F.col("id").cast("int").alias("bucket")
            )
        )
    )
    dense = (
        grid.join(rcnt, ["k", "bucket"], "left")
        .join(ccnt, ["k", "bucket"], "left")
        .select(
            "k",
            "bucket",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    tot = dense.groupBy("k").agg(
        F.sum("cr").alias("nr"), F.sum("cc").alias("nc")
    )
    smooth = float(PSI_SMOOTH)
    pad = smooth * buckets
    j = dense.join(F.broadcast(tot), "k")
    pr = (F.col("cr").cast("double") + F.lit(smooth)) / (
        F.col("nr").cast("double") + F.lit(pad)
    )
    pc = (F.col("cc").cast("double") + F.lit(smooth)) / (
        F.col("nc").cast("double") + F.lit(pad)
    )
    return (
        j.groupBy("k")
        .agg(
            F.max("nr").alias("n_ref"),
            F.max("nc").alias("n_cur"),
            F.round(F.sum((pc - pr) * F.log(pc / pr)), 6).alias("psi"),
        )
        .select(
            F.col("k").alias(key_col), "n_ref", "n_cur", "psi"
        )
        .orderBy(key_col)
    )


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did any event type's value distribution drift between the first
    and second half of the month? Exact-decile PSI per type."""
    ev = load_table(spark, sf_dir, "events")
    return psi_drift(ev)


def chi_square(cells: DataFrame) -> DataFrame:
    """Pearson chi-square independence test from a contingency-cell
    relation (x, y, nxy): one row (n_rows, chi2, dof, cramers_v).

    Identity (single-sum form, exact integer counts):
      chi2 = N · (Σ_xy nxy² / (n_x·n_y) − 1)
    Cramér's V = sqrt(chi2 / (N · min(|X|−1, |Y|−1))).
    """
    cells = cells.localCheckpoint(eager=True)
    spark = cells.sparkSession
    mx = cells.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").alias("ny"))
    n = cells.agg(F.sum("nxy")).collect()[0][0]
    if n is None:  # empty cell relation
        return spark.createDataFrame(
            [], "n_rows bigint, chi2 double, dof bigint, cramers_v double"
        )
    rx = mx.count()
    ry = my.count()
    nd = F.lit(float(n))
    s = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .agg(
            F.sum(
                F.col("nxy").cast("double")
                * F.col("nxy").cast("double")
                / (F.col("nx").cast("double") * F.col("ny").cast("double"))
            ).alias("s")
        )
    )
    dof = (rx - 1) * (ry - 1)
    mindim = min(rx - 1, ry - 1)
    return s.select(
        F.lit(int(n)).cast("bigint").alias("n_rows"),
        F.round(nd * (F.col("s") - F.lit(1.0)), 6).alias("chi2"),
        F.lit(dof).cast("bigint").alias("dof"),
        (
            F.round(
                F.sqrt(nd * (F.col("s") - F.lit(1.0)) / (nd * mindim)), 6
            )
            if mindim > 0
            else F.lit(None).cast("double")
        ).alias("cramers_v"),
    )


def q_events_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is event type independent of hour-of-day? Pearson chi-square +
    Cramér's V from the exact contingency table (shares the MI
    family's cell state)."""
    ev = load_table(spark, sf_dir, "events")
    return chi_square(
        contingency_cells(
            ev, F.col("event_type"), hour_index() % F.lit(24)
        )
    )


def psi_value_counters(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    split_hour: int = PSI_SPLIT_HOUR,
) -> DataFrame:
    """PSI's mergeable state: exact (k, half, v, c) counters — one row
    per (group, window-half, distinct value), closed under per-key
    addition. Domain-bounded exactly like the histogram twin's
    counter state (|keys| · 2 · |value domain|)."""
    from bigdataminingproject_spark.operators.trends import hour_index

    return (
        df.select(
            F.col(key_col).alias("k"),
            hour_index().alias("h"),
            F.col(val_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull() & F.col("k").isNotNull())
        .filter(F.col("h").isNotNull())
        .select(
            "k",
            F.when(F.col("h") < split_hour, F.lit("ref"))
            .otherwise(F.lit("cur"))
            .alias("half"),
            "v",
        )
        .groupBy("k", "half", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def fold_psi_counters(parts: DataFrame) -> DataFrame:
    """LSM merge-operator: per-(k, half, v) integer addition."""
    return parts.groupBy("k", "half", "v").agg(F.sum("c").alias("c"))


def psi_from_counters(
    counters: DataFrame,
    buckets: int = PSI_BUCKETS,
    key_col: str = "event_type",
) -> DataFrame:
    """Rebuild the exact PSI report from folded (k, half, v, c)
    counters — bit-identical to ``psi_drift`` on the raw rows: the
    reference deciles come from the SAME pinned rank rule over a
    cumulative walk on the (bounded) pooled reference counters, the
    bucket populations are the same Σ(v > boundary) flag expression
    weighted by c, and the smoothing/fold arithmetic is shared.

    ``key_col`` names the report's key column (matching whatever
    ``psi_value_counters`` was grouped by — its producer is
    parameterized the same way)."""
    import math as _math
    from functools import reduce

    from pyspark.sql.window import Window as _W

    spark = counters.sparkSession
    ref_pool = (
        counters.filter(F.col("half") == "ref")
        .groupBy("v")
        .agg(F.sum("c").alias("c"))
    )
    tot_row = ref_pool.agg(F.sum("c").alias("n")).collect()[0]
    total = int(tot_row["n"] or 0)
    if total == 0:
        ktype = counters.schema["k"].dataType.simpleString()
        return spark.createDataFrame(
            [],
            f"{key_col} {ktype}, n_ref bigint, n_cur bigint, psi double",
        )
    cum = ref_pool.withColumn(
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
    bmap = {int(r["i"]): float(r["b"]) for r in brows}
    bs = [bmap[i] for i in range(1, buckets)]
    bucket = reduce(
        lambda acc, b: acc
        + F.when(F.col("v") > F.lit(b), F.lit(1)).otherwise(F.lit(0)),
        bs,
        F.lit(1),
    )
    cnt = (
        counters.groupBy("k", "half", bucket.alias("bucket"))
        .agg(F.sum("c").alias("n"))
        .localCheckpoint(eager=True)
    )
    rcnt = cnt.filter(F.col("half") == "ref").select(
        "k", "bucket", F.col("n").alias("cr")
    )
    ccnt = cnt.filter(F.col("half") == "cur").select(
        "k", "bucket", F.col("n").alias("cc")
    )
    keys = (
        rcnt.select("k").unionByName(ccnt.select("k")).distinct()
    )
    grid = keys.crossJoin(
        F.broadcast(
            spark.range(1, buckets + 1).select(
                F.col("id").cast("int").alias("bucket")
            )
        )
    )
    dense = (
        grid.join(rcnt, ["k", "bucket"], "left")
        .join(ccnt, ["k", "bucket"], "left")
        .select(
            "k",
            "bucket",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    tot = dense.groupBy("k").agg(
        F.sum("cr").alias("nr"), F.sum("cc").alias("nc")
    )
    smooth = float(PSI_SMOOTH)
    pad = smooth * buckets
    j = dense.join(F.broadcast(tot), "k")
    pr = (F.col("cr").cast("double") + F.lit(smooth)) / (
        F.col("nr").cast("double") + F.lit(pad)
    )
    pc = (F.col("cc").cast("double") + F.lit(smooth)) / (
        F.col("nc").cast("double") + F.lit(pad)
    )
    return (
        j.groupBy("k")
        .agg(
            F.max("nr").alias("n_ref"),
            F.max("nc").alias("n_cur"),
            F.round(F.sum((pc - pr) * F.log(pc / pr)), 6).alias("psi"),
        )
        .select(F.col("k").alias(key_col), "n_ref", "n_cur", "psi")
        .orderBy(key_col)
    )


def dependence_profile(
    df: DataFrame, pairs: list[tuple[str, str, Column, Column]]
) -> DataFrame:
    """MI/NMI ranked over candidate column pairs — the data-catalog
    "which columns move together" report (generalizes the single-pair
    ``mutual_information`` the way ``fd_profile`` generalizes a single
    FD check). Each candidate costs one column-pruned scan to its
    bounded contingency cells; the information folds all happen on
    those tiny relations.

    ``pairs`` entries are (label_x, label_y, col_x, col_y); output one
    row per pair (col_x, col_y, n_rows, h_x, h_y, mi_nats, nmi),
    ordered by (col_x, col_y) — NMI is the ranking signal but the
    emitted order is pinned on the labels so engines can't disagree on
    float ties."""
    if not pairs:
        return df.sparkSession.createDataFrame(
            [],
            "col_x string, col_y string, n_rows bigint, h_x double, "
            "h_y double, mi_nats double, nmi double",
        )
    outs = []
    for nx, ny, cx, cy in pairs:
        mi = mi_from_cells(contingency_cells(df, cx, cy))
        outs.append(
            mi.select(
                F.lit(nx).alias("col_x"),
                F.lit(ny).alias("col_y"),
                "n_rows",
                "h_x",
                "h_y",
                "mi_nats",
                "nmi",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("col_x", "col_y")


ORDERS_DEPENDENCE_CANDIDATES = [
    ("o_orderpriority", "order_month"),
    ("o_orderstatus", "o_orderpriority"),
    ("o_orderstatus", "order_year"),
    ("order_year", "order_month"),
]


def _orders_dependence_col(name: str) -> Column:
    if name == "order_year":
        return F.year("o_orderdate")
    if name == "order_month":
        return F.month("o_orderdate")
    return F.col(name)


def q_orders_dependence_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Which orders columns carry information about each other?
    MI/NMI for four canonical candidate pairs (status, priority, and
    the order date's year/month grains)."""
    orders = load_table(spark, sf_dir, "orders")
    return dependence_profile(
        orders,
        [
            (nx, ny, _orders_dependence_col(nx), _orders_dependence_col(ny))
            for nx, ny in ORDERS_DEPENDENCE_CANDIDATES
        ],
    )


def benford_profile(
    df: DataFrame, col: str, scale: int = 100
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fraud/data-quality screen. Values are integerized on the
    repo's exact grid (floor(x·scale + 0.5)); the first digit is the
    leading character of the positive integer's decimal string —
    pure integer/string ops, so both engines bucket identically, and
    ln(1 + 1/d)/ln(10) is the one pinned double expression.

    Output: (digit, n_obs, obs_p, benford_p, dev) for digits 1-9,
    dev = obs_p − benford_p; aggregation-only, one column-pruned
    scan at any corpus size."""
    units = df.select(
        F.floor(F.col(col) * scale + F.lit(0.5))
        .cast("long")
        .alias("u")
    ).filter(F.col("u") > 0)
    obs = (
        units.select(
            F.substring(F.col("u").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spark = df.sparkSession
    digits = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    tot = obs.agg(F.sum("n_obs").alias("n"))
    dense = (
        digits.join(F.broadcast(obs), "digit", "left")
        .select(
            "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n") > 0)
    )
    obs_p = F.col("n_obs").cast("double") / F.col("n").cast("double")
    ben_p = F.log(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    ) / F.log(F.lit(10.0))
    return dense.select(
        "digit",
        "n_obs",
        F.round(obs_p, 6).alias("obs_p"),
        F.round(ben_p, 6).alias("benford_p"),
        F.round(obs_p - ben_p, 6).alias("dev"),
    ).orderBy("digit")


def q_orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do order totals follow Benford's law? First-digit distribution
    of o_totalprice vs the ln(1+1/d) expectation."""
    orders = load_table(spark, sf_dir, "orders")
    return benford_profile(orders, "o_totalprice")
