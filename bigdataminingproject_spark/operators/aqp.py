"""Approximate query processing (AQP): sample-based aggregation with
error bars — the BlinkDB/online-aggregation shape.

At 100 TB many dashboards don't need the exact total; they need a fast
estimate WITH a confidence interval. This module answers with a
deterministic hash sample (every row whose 48-bit md5 key lands in a
1-in-``rate_inv`` bucket), inverse-probability scaling, and a CLT
95% half-width from the sample's exact integer moments:

  est        = sum(sample) / p                (p = 1/rate_inv)
  Var(est)   = sum(sample^2) * (1-p) / p^2    (Bernoulli inclusion)
  ci95_half  = 1.96 * sqrt(Var(est))

Determinism discipline (what lets DuckDB replay it bit-for-bit): the
sample is a pure function of the row key (no RNG, no sample() — the
same rows are in the sample on every engine and every run); the money
column is folded at its exact 4-dp integer scale, and BOTH moments
accumulate as DECIMAL(38,0) — associative exact integer sums, immune
to shuffle order, wide enough that sum-of-squares cannot overflow at
any corpus size a long would allow. Doubles appear only in the final
scalar arithmetic, identically derived on both engines.

On a bucketed/partitioned layout the hash-bucket sample prunes at the
scan (sources/bucketing.py); on flat files it is one cheap full scan
— still ~rate_inv x less aggregation work, and the exact leg here is
kept ONLY to attest the error envelope (production callers drop it).

No reference counterpart (north-star OLAP family: BlinkDB, Hellerstein
et al. online aggregation).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import lit_array
from pyspark.sql.window import Window

from bigdataminingproject_spark.functions.numeric import stable_round_div
from bigdataminingproject_spark.sources.tables import load_table

AQP_RATE_INV = 100  # 1% deterministic hash sample


def _hash48(col) -> F.Column:
    """48-bit md5-derived BIGINT, identical in Spark and DuckDB (the
    kmv_hash idiom)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def aqp_sum_estimate(
    df: DataFrame,
    key_col: F.Column,
    units_col: F.Column,
    unit_scale: int,
    rate_inv: int = AQP_RATE_INV,
) -> DataFrame:
    """One-row (n_sampled, est, exact, rel_err_pct, ci95_half) for the
    sum of ``units_col`` (an exact integer at ``unit_scale`` units per
    currency unit), sampled at 1/``rate_inv`` by ``key_col`` hash."""
    rows = df.select(
        (_hash48(key_col) % rate_inv == 0).alias("in_sample"),
        units_col.cast("decimal(38,0)").alias("u"),
    )
    agg = rows.agg(
        F.sum(F.when(F.col("in_sample"), F.col("u"))).alias("s_units"),
        F.sum(
            F.when(F.col("in_sample"), F.col("u") * F.col("u"))
        ).alias("sq_units"),
        F.count(F.when(F.col("in_sample"), F.lit(1))).alias("n_sampled"),
        F.sum("u").alias("exact_units"),
    )
    p = 1.0 / rate_inv
    scale = float(unit_scale)
    # empty sample -> 0.0 estimate with 0.0 half-width (same rule as
    # the grouped variant — a NULL est on a small input was a latent
    # surprise for library callers; the oracle coalesces identically)
    est = F.round(
        F.coalesce(F.col("s_units").cast("double"), F.lit(0.0)) / p / scale,
        2,
    )
    exact = F.round(F.col("exact_units").cast("double") / scale, 2)
    ci = F.round(
        F.lit(1.96)
        * F.sqrt(
            F.coalesce(F.col("sq_units").cast("double"), F.lit(0.0))
            * (1.0 - p)
            / (p * p)
        )
        / scale,
        2,
    )
    return agg.select(
        "n_sampled",
        est.alias("est"),
        exact.alias("exact"),
        stable_round_div(
            F.abs(est - exact) * F.lit(100.0), exact, 4
        ).alias("rel_err_pct"),
        ci.alias("ci95_half"),
    )


def aqp_grouped_sum_estimate(
    df: DataFrame,
    group_col: str,
    key_col: F.Column,
    units_col: F.Column,
    unit_scale: int,
    rate_inv: int = AQP_RATE_INV,
) -> DataFrame:
    """Per-group (group, n_sampled, est, exact, rel_err_pct, ci95_half)
    — the dashboard form. Same hash sample and exact-moment
    discipline; one hash-agg per group, so group count scales freely
    (no driver state at all)."""
    rows = df.select(
        F.col(group_col).alias("g"),
        (_hash48(key_col) % rate_inv == 0).alias("in_sample"),
        units_col.cast("decimal(38,0)").alias("u"),
    ).filter(F.col("g").isNotNull())
    agg = rows.groupBy("g").agg(
        F.sum(F.when(F.col("in_sample"), F.col("u"))).alias("s_units"),
        F.sum(
            F.when(F.col("in_sample"), F.col("u") * F.col("u"))
        ).alias("sq_units"),
        F.count(F.when(F.col("in_sample"), F.lit(1))).alias("n_sampled"),
        F.sum("u").alias("exact_units"),
    )
    p = 1.0 / rate_inv
    scale = float(unit_scale)
    est = F.round(
        F.coalesce(F.col("s_units").cast("double"), F.lit(0.0)) / p / scale,
        2,
    )
    exact = F.round(F.col("exact_units").cast("double") / scale, 2)
    ci = F.round(
        F.lit(1.96)
        * F.sqrt(
            F.coalesce(F.col("sq_units").cast("double"), F.lit(0.0))
            * (1.0 - p)
            / (p * p)
        )
        / scale,
        2,
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_sampled",
        est.alias("est"),
        exact.alias("exact"),
        stable_round_div(
            F.abs(est - exact) * F.lit(100.0), exact, 4
        ).alias("rel_err_pct"),
        ci.alias("ci95_half"),
    ).orderBy(group_col)


def aqp_quantile_estimate(
    df: DataFrame,
    key_col: F.Column,
    value_col: str,
    q: float = 0.5,
    rate_inv: int = AQP_RATE_INV,
) -> DataFrame:
    """One-row sample-quantile estimate with a DISTRIBUTION-FREE
    confidence interval: the q-quantile of the deterministic hash
    sample, bracketed by the classic binomial order-statistic bounds
    (sample ranks ceil(qm -/+ 1.96*sqrt(m q (1-q))) — no CLT on the
    values, no density assumption; only the sample indicator is
    treated as Bernoulli), next to the exact full-data quantile as the
    attested envelope.

    Every quantile here — the three sample ranks AND the exact leg —
    is an exact order statistic via the shared selection descent
    (operators/selection.py), so both engines pick identical VALUES;
    the rank arithmetic is the same IEEE double sequence on both
    sides. Returns (n_sampled, est, exact, rel_err_pct, ci_lo,
    ci_hi).
    """
    import math

    from bigdataminingproject_spark.operators.selection import (
        exact_ranks,
    )

    spark = df.sparkSession
    out_schema = (
        "n_sampled bigint, est double, exact double, rel_err_pct double, "
        "ci_lo double, ci_hi double"
    )
    # rank over the NON-NULL value population on both engines (a NULL
    # value would otherwise inflate the rank budget past exact_ranks'
    # clamped keys — driver KeyError — and DuckDB would rank the NULL
    # tail); the oracle filters identically
    vals = df.filter(F.col(value_col).isNotNull())
    sample = vals.filter(_hash48(key_col) % rate_inv == 0)
    # ONE scan yields both populations' (count, min, max) — the
    # descent calls below reuse them instead of re-aggregating
    st = vals.select(
        (_hash48(key_col) % rate_inv == 0).alias("in_s"),
        F.col(value_col).cast("double").alias("v"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum(F.when(F.col("in_s"), 1).otherwise(0)).alias("m"),
        F.min(F.when(F.col("in_s"), F.col("v"))).alias("slo"),
        F.max(F.when(F.col("in_s"), F.col("v"))).alias("shi"),
    ).collect()[0]
    m = int(st["m"] or 0)
    n = int(st["n"] or 0)
    if m == 0 or n == 0:
        # degenerate shapes mirror the oracle's always-one-row CTE
        # chain: empty sample -> NULL estimate next to the real exact;
        # empty table -> all-NULL row (same rule the sum estimator's
        # coalesce fix followed, but a NULL is honest for a quantile)
        if n == 0:
            row = (0, None, None, None, None, None)
        else:
            exact = exact_ranks(
                vals,
                value_col,
                (max(1, math.ceil(q * float(n))),),
                stats=(n, st["lo"], st["hi"]),
            )
            row = (0, None, next(iter(exact.values())), None, None, None)
        return spark.createDataFrame([row], out_schema)
    r_mid = max(1, math.ceil(q * float(m)))
    half = 1.96 * math.sqrt(float(m) * q * (1.0 - q))
    r_lo = max(1, math.ceil(q * float(m) - half))
    r_hi = min(m, math.ceil(q * float(m) + half))
    sv = exact_ranks(
        sample,
        value_col,
        (r_mid, r_lo, r_hi),
        stats=(m, st["slo"], st["shi"]),
    )
    exact = exact_ranks(
        vals,
        value_col,
        (max(1, math.ceil(q * float(n))),),
        stats=(n, st["lo"], st["hi"]),
    )
    est = sv[max(1, min(m, r_mid))]
    ex = next(iter(exact.values()))
    rel = (
        math.floor(abs(est - ex) * 100.0 * 10000.0 / ex + 0.5) / 10000.0
        if ex
        else 0.0
    )
    return spark.createDataFrame(
        [
            (
                m,
                est,
                ex,
                rel,
                sv[max(1, min(m, r_lo))],
                sv[max(1, min(m, r_hi))],
            )
        ],
        out_schema,
    )


def aqp_quantile_sample_only(
    df: DataFrame,
    key_col: F.Column,
    value_col: str,
    q: float = 0.5,
    rate_inv: int = AQP_RATE_INV,
) -> DataFrame:
    """The PRODUCTION form of the AQP quantile (VERDICT r9 #6): the
    sample quantile with its distribution-free binomial rank bounds
    and NO exact-envelope leg — ``aqp_quantile_estimate``'s exact
    full-column descent exists only to attest the error envelope, and
    an AQP operator whose every run costs more than the exact answer
    defeats the family's point.

    Cost shape: the full column is touched exactly ONCE, by the cheap
    hash-sample predicate scan (which a bucketed layout prunes at the
    scan); the selection descent, rank arithmetic, and both CI bounds
    run only over the 1-in-``rate_inv`` sample, so the operator's
    aggregate work is proportional to the SAMPLE size. Returns
    (n_sampled, est, ci_lo, ci_hi); determinism discipline identical
    to the envelope form (pure hash sample, shared pinned rank rule),
    so DuckDB replays it bit-for-bit."""
    import math

    from bigdataminingproject_spark.operators.selection import (
        exact_ranks,
    )

    spark = df.sparkSession
    out_schema = "n_sampled bigint, est double, ci_lo double, ci_hi double"
    sample = df.filter(F.col(value_col).isNotNull()).filter(
        _hash48(key_col) % rate_inv == 0
    )
    st = sample.agg(
        F.count(F.lit(1)).alias("m"),
        F.min(F.col(value_col).cast("double")).alias("slo"),
        F.max(F.col(value_col).cast("double")).alias("shi"),
    ).collect()[0]
    m = int(st["m"] or 0)
    if m == 0:
        return spark.createDataFrame([(0, None, None, None)], out_schema)
    r_mid = max(1, math.ceil(q * float(m)))
    half = 1.96 * math.sqrt(float(m) * q * (1.0 - q))
    r_lo = max(1, math.ceil(q * float(m) - half))
    r_hi = min(m, math.ceil(q * float(m) + half))
    sv = exact_ranks(
        sample,
        value_col,
        (r_mid, r_lo, r_hi),
        stats=(m, st["slo"], st["shi"]),
    )
    return spark.createDataFrame(
        [
            (
                m,
                sv[max(1, min(m, r_mid))],
                sv[max(1, min(m, r_lo))],
                sv[max(1, min(m, r_hi))],
            )
        ],
        out_schema,
    )


def q_lineitem_aqp_quantile_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1% hash-sample median of l_extendedprice with binomial rank
    bounds — the sample-only production form (the exact-envelope twin
    q_lineitem_aqp_quantile stays registered at driver SFs)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return aqp_quantile_sample_only(li, key, "l_extendedprice", q=0.5)


def q_lineitem_aqp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1% hash-sample median of l_extendedprice with binomial
    order-statistic 95% bounds and the exact-median envelope — the
    quantile leg of the AQP family (sums get CLT bars; quantiles get
    distribution-free rank bars)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return aqp_quantile_estimate(li, key, "l_extendedprice", q=0.5)


def q_lineitem_aqp_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag AQP revenue estimates with their own error bars
    — the grouped dashboard form of q_lineitem_aqp_revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    )
    return aqp_grouped_sum_estimate(
        li, "l_returnflag", key, units, unit_scale=10_000
    )


def q_lineitem_aqp_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1% deterministic-hash AQP estimate of total discounted revenue
    over lineitem, with its CLT 95% half-width and the exact envelope.
    Revenue is exact at 4 dp (price 2 dp x discount 2 dp), folded as
    integer ten-thousandths."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    )
    return aqp_sum_estimate(li, key, units, unit_scale=10_000)


# ---------------------------------------------------------------------------
# Poisson bootstrap: distribution-free error bars in ONE pass
# ---------------------------------------------------------------------------

# Integer thresholds floor(CDF_Poisson(1)(k) * 2^20), k = 0..9: a row's
# bootstrap weight in replica r is the number of thresholds <= its
# 20-bit hash draw — a pure integer staircase both engines evaluate
# identically (no float CDF literals in the comparison path).
BOOT_THRESHOLDS = (
    385749, 771499, 964373, 1028665, 1044738,
    1047952, 1048488, 1048565, 1048574, 1048575,
)
BOOT_REPLICAS = 32
BOOT_DENOM = 1 << 20


def poisson_bootstrap_means(
    df: DataFrame,
    group_col: str,
    key_col: F.Column,
    units_col: F.Column,
    unit_scale: int,
    replicas: int = BOOT_REPLICAS,
) -> DataFrame:
    """Per-group Poisson(1)-bootstrap mean estimates with order-
    statistic confidence bounds — the distribution-free sibling of the
    CLT bars above (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012).

    The classic bootstrap resamples N rows WITH replacement B times —
    impossible to coordinate across a cluster. The Poisson bootstrap
    replaces each replica's multinomial with independent Poisson(1)
    weights per (row, replica): every row computes its own weights
    from a deterministic hash, so the whole thing is ONE scan, B
    integer-weighted partial sums per group, no shuffle of raw rows
    beyond the group agg. Each replica's weighted sum is an EXACT
    bigint (weights <= 10, units exact integers), so replica means are
    engine-identical doubles and the percentile bounds — 2nd-smallest
    / 2nd-largest of 32 replica means, a ~94% interval — replay
    bit-for-bit on the oracle.

    Returns (group, n_rows, mean_value, boot_lo, boot_hi, boot_width).
    """
    reps = F.explode(
        lit_array(list(range(1, replicas + 1)))
    ).alias("r")
    u = _hash48(
        F.concat(F.col("_key"), F.lit(":"), F.col("r").cast("string"))
    ) % BOOT_DENOM
    w = reduce(
        lambda acc, t: acc
        + F.when(F.col("u") >= F.lit(t), F.lit(1)).otherwise(F.lit(0)),
        BOOT_THRESHOLDS,
        F.lit(0),
    )
    rows = df.select(
        F.col(group_col).alias("g"),
        key_col.alias("_key"),
        units_col.cast("long").alias("y"),
        reps,
    ).select(
        "g", "y", "r", u.alias("u")
    ).select(
        "g", "y", "r", w.alias("w")
    )
    per_replica = rows.groupBy("g", "r").agg(
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum("w").alias("sw"),
    )
    scale = float(unit_scale)
    # drop all-zero-weight replicas BEFORE ranking: Spark windows rank
    # NULLs first in ASC order while DuckDB ranks them last, so a NULL
    # replica mean would silently shift the order-statistic bounds on
    # one engine only (P ~ e^-n per replica — tiny groups only, but
    # the rule must be engine-identical; the oracle filters sw > 0 the
    # same way)
    rmeans = per_replica.filter(F.col("sw") > 0).select(
        "g",
        "r",
        (
            F.col("swy").cast("double")
            / F.col("sw").cast("double")
            / scale
        ).alias("m"),
    )
    asc = Window.partitionBy("g").orderBy(F.col("m").asc(), F.col("r").asc())
    desc = Window.partitionBy("g").orderBy(
        F.col("m").desc(), F.col("r").desc()
    )
    bounds = (
        rmeans.withColumn("ra", F.row_number().over(asc))
        .withColumn("rd", F.row_number().over(desc))
        .groupBy("g")
        .agg(
            F.max(F.when(F.col("ra") == 2, F.col("m"))).alias("lo"),
            F.max(F.when(F.col("rd") == 2, F.col("m"))).alias("hi"),
        )
    )
    full = df.select(
        F.col(group_col).alias("g"), units_col.cast("long").alias("y")
    ).groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("y").alias("sy")
    )
    return (
        full.join(bounds, "g")
        .select(
            F.col("g").alias(group_col),
            "n_rows",
            F.round(
                F.col("sy").cast("double")
                / F.col("n_rows").cast("double")
                / scale,
                6,
            ).alias("mean_value"),
            F.round(F.col("lo"), 6).alias("boot_lo"),
            F.round(F.col("hi"), 6).alias("boot_hi"),
            F.round(F.col("hi") - F.col("lo"), 6).alias("boot_width"),
        )
        .orderBy(group_col)
    )


def q_events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How uncertain is each event type's mean value? 32-replica
    Poisson-bootstrap order-statistic bounds, one scan, all-integer
    partials."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5))
    return poisson_bootstrap_means(
        ev,
        "event_type",
        F.col("event_id").cast("string"),
        cents,
        unit_scale=100,
    )
