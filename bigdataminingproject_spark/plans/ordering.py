"""Scalable global ordering: distributed row numbers.

A bare ``row_number() OVER (ORDER BY ...)`` collapses the whole relation
into one partition — fine at test SFs, fatal at 100 TB. The standard
two-phase fix: bucket rows by range, number within buckets in parallel,
then add per-bucket prefix offsets.

Crucially the bucket id is computed FROM THE DATA (deterministic
quantile boundaries collected once), not from ``spark_partition_id()``
over a ``repartitionByRange`` exchange: range exchanges sample their
boundaries at execution time, so two plan branches (numbering + counts)
can disagree about which partition a row landed in — a silent
correctness bug this module's first version had. Value-derived buckets
make every branch agree by construction, and equal order-key values can
never straddle a bucket boundary (strict ``<`` comparison), so
tiebreaker ordering stays local to one bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import lit_array
from pyspark.sql.window import Window

from bigdataminingproject_spark.session import shuffle_partitions


def with_global_position(
    df: DataFrame,
    order_col: str,
    tiebreakers: list[Column | str] | None = None,
    pos_col: str = "rn",
    num_partitions: int | None = None,
    nulls_last: bool = True,
) -> DataFrame:
    """Attach a 1-based global position.

    ``order_col`` must be a numeric column (quantile boundaries are
    computed on it); ``tiebreakers`` complete the total order among equal
    values and NULLs. NULL order values sort last (reference S4
    semantics).
    """
    tiebreakers = list(tiebreakers or [])
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = shuffle_partitions(spark)
    # deterministic value boundaries (nulls ignored by approxQuantile)
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = sorted(set(df.approxQuantile(order_col, probs, 0.001))) if probs else []
    if bounds:
        bounds_arr = lit_array([float(b) for b in bounds])
        bucket_of = F.size(
            F.filter(bounds_arr, lambda b: b < F.col(order_col))
        )
    else:
        bucket_of = F.lit(0)
    null_bucket = len(bounds) + 1  # strictly after every value bucket
    bucket = (
        F.when(F.col(order_col).isNull(), F.lit(null_bucket)).otherwise(
            bucket_of
        )
        if nulls_last
        else F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(bucket_of)
    )
    bucketed = df.withColumn("_bkt", bucket)
    order = [
        F.col(order_col).asc_nulls_last()
        if nulls_last
        else F.col(order_col).asc_nulls_first()
    ] + tiebreakers
    w = Window.partitionBy("_bkt").orderBy(*order)
    local = bucketed.withColumn("_lrn", F.row_number().over(w))
    # per-bucket prefix offsets: tiny relation, cumulative window over
    # bucket id (bucket order == value order by construction)
    counts = bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    # Unpartitioned window is safe HERE ONLY because counts has one row
    # per quantile bucket (n_buckets ~ shuffle parallelism, a few
    # thousand at most) — bounded by construction, not by data volume;
    # enforced plan-wide by unsafe_single_partition_exchanges.
    off_w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(pos_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_bkt", "_lrn", "_off")
    )


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    tiebreakers: list[Column | str] | None = None,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the EXCLUSIVE global running sum of ``value_col`` in
    (``order_col``, ``tiebreakers``) order — "how much value precedes
    this row". Same two-phase scheme as :func:`with_global_position`
    (value-derived quantile buckets, local window, broadcast per-bucket
    prefix offsets), so no single-partition window ever sees the fact
    relation. ``order_col`` must be numeric and non-null (callers order
    by a hash variate or timestamp; derive one first if needed).
    """
    tiebreakers = list(tiebreakers or [])
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = shuffle_partitions(spark)
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = (
        sorted(set(df.approxQuantile(order_col, probs, 0.001)))
        if probs
        else []
    )
    if bounds:
        bounds_arr = lit_array([float(b) for b in bounds])
        bucket = F.size(F.filter(bounds_arr, lambda b: b < F.col(order_col)))
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_bkt", bucket)
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(order_col).asc(), *tiebreakers)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_lcs", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )
    totals = bucketed.groupBy("_bkt").agg(F.sum(value_col).alias("_tot"))
    # one row per quantile bucket — same bounded-cardinality argument as
    # the offsets window in with_global_position
    off_w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_off") + F.col("_lcs")).cast("long"))
        .drop("_bkt", "_lcs", "_off")
    )


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` of two integer
    columns — the multi-dimensional clustering key behind Delta/Iceberg
    Z-ORDER layout. Files sorted by this key are simultaneously
    range-clustered on BOTH dimensions, so predicate pushdown prunes
    data files for filters on either column (a plain sort only serves
    its leading column).

    Pure integer shift/mask expressions — whole-stage-codegen'd, no UDF,
    and bit-identical in any engine that has ``>>``, ``&`` and ``|``.
    """
    za = F.lit(0).cast("long")
    for i in range(bits):
        za = (
            za.bitwiseOR(
                F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return za


def zorder_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton-key arithmetic as a SQL expression string."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout_stats(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 16,
    range_bits: int = 8,
) -> DataFrame:
    """Quantify what a Z-order rewrite buys: bucket rows by the top
    ``range_bits`` of their Morton key (one bucket ~ one data file after
    the layout pass) and report each bucket's row count and min/max of
    BOTH dimensions — tight per-bucket envelopes on both columns are
    exactly the property that lets min/max file statistics prune scans
    for either predicate.

    Raw keys rarely span the full bit range, so both dimensions are
    first normalized to [0, 2^bits) with exact integer min/max scaling
    (one bounded stats collect — four longs); the same integer division
    reproduces bit-identically in SQL.

    One projection + one hash-agg on a 2^range_bits key space.
    """
    stats = df.agg(
        F.min(a_col).alias("amin"),
        F.max(a_col).alias("amax"),
        F.min(b_col).alias("bmin"),
        F.max(b_col).alias("bmax"),
    ).collect()[0]
    top = (1 << bits) - 1

    def _norm(col: Column, lo: int, hi: int) -> Column:
        span = hi - lo
        if span <= 0:
            return F.lit(0).cast("long")
        return ((col - F.lit(lo)) * F.lit(top)).cast("long") / F.lit(
            span
        )

    a_n = F.floor(_norm(F.col(a_col), stats["amin"], stats["amax"])).cast(
        "long"
    )
    b_n = F.floor(_norm(F.col(b_col), stats["bmin"], stats["bmax"])).cast(
        "long"
    )
    z = zorder_key(a_n, b_n, bits)
    shift = 2 * bits - range_bits
    return (
        df.select(
            F.shiftright(z, shift).alias("z_bucket"),
            F.col(a_col).alias("_a"),
            F.col(b_col).alias("_b"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_a").alias("a_min"),
            F.max("_a").alias("a_max"),
            F.min("_b").alias("b_min"),
            F.max("_b").alias("b_max"),
        )
        .orderBy("z_bucket")
    )


def q_lineitem_zorder(spark, sf_dir: str) -> DataFrame:
    """Z-order layout audit of lineitem on (l_partkey, l_suppkey): the
    per-bucket envelope table that predicts file-skipping effectiveness
    after a Z-ORDER rewrite."""
    from bigdataminingproject_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return zorder_layout_stats(li, "l_partkey", "l_suppkey")


def grouped_position(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreakers: list[Column | str] | None = None,
    pos_col: str = "step",
    order_bound: int = 10_000_000_000,
) -> DataFrame:
    """FULL per-group 1-based rank of a scaling relation without a
    per-group window.

    ``row_number() OVER (PARTITION BY group ...)`` is fine for top-k
    (Catalyst's WindowGroupLimit prunes before the exchange) but for a
    FULL ranking every group's rows still serialize through one task
    per group — with a handful of groups over a 100 TB corpus that is
    a many-TB single-task sort. This plan instead:

    1. indexes the groups (group-name order) and takes per-group
       counts — a bounded, broadcastable relation;
    2. builds one composite numeric key ``idx * order_bound +
       order_col`` (``order_col`` must be a non-negative integer
       < ``order_bound``) whose GLOBAL order is (group, value);
    3. runs the bucketed two-phase global position over it (quantile
       buckets spread every group across many tasks);
    4. subtracts each group's broadcast prefix offset, turning the
       global position back into the per-group rank.

    Identical output to the partitioned row_number, parallel in the
    corpus rather than in the group count.
    """
    tiebreakers = list(tiebreakers or [])
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    # bounded window: one row per group (same legitimacy note as
    # with_global_position's offsets relation)
    gw = Window.orderBy(group_col)
    off_w = gw.rowsBetween(Window.unboundedPreceding, -1)
    idxed = counts.select(
        group_col,
        (F.row_number().over(gw) - 1).alias("_gidx"),
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_goff"),
    )
    keyed = df.join(F.broadcast(idxed), group_col).withColumn(
        "_gkey",
        F.col("_gidx").cast("long") * F.lit(order_bound)
        + F.col(order_col).cast("long"),
    )
    pos = with_global_position(
        keyed,
        "_gkey",
        tiebreakers=[F.col(group_col)] + tiebreakers,
        pos_col="_grn",
    )
    return pos.withColumn(
        pos_col, (F.col("_grn") - F.col("_goff")).cast("long")
    ).drop("_gidx", "_goff", "_gkey", "_grn")
