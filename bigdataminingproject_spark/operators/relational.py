"""Relational query surface over the synthetic star schema.

The reference has no joins/grouping at all (SURVEY.md §2.9) — this module is
the standard relational surface a user of a general engine expects, written
so Catalyst gets everything it needs:

- filters/projections expressed declaratively → pushdown + pruning into the
  parquet scan;
- fixed-cardinality dimensions (region: 5 rows, nation: 25) joined with
  explicit ``F.broadcast``; tables that scale with the data (customer,
  supplier, part) are left to AQE, which broadcasts them at small SF from
  runtime sizes and falls back to shuffle joins at cluster scale — a
  hard-coded broadcast there would OOM the driver at 100 TB;
- aggregations are plain hash aggregates → partial+final map-side combine;
- top-k is ``orderBy().limit()`` → TakeOrderedAndProject, never a full sort.

Every query aliases its computed columns to stable names matching the
DuckDB oracle (see ``__spark_entry__.oracle_sql``). Money aggregates are
rounded to 2 decimals on both sides so value hashes are float-order stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.numeric import stable_avg
from bigdataminingproject_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (flagship query)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            stable_avg(F.col("l_quantity"), 2).alias("avg_qty"),
            stable_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
            stable_avg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 open orders by revenue for one segment."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation within one region/date range."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    # Dimension chain region→nation broadcast; the customer-nation and
    # supplier-nation equality mirrors TPC-H Q5 (local suppliers only).
    dim = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dim, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


REGION_REVENUE_SQL = """
    SELECT r.r_name AS region,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           count(*) AS line_count
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name
    ORDER BY region
"""


def q_sql_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL front door (VERDICT r5 #8): the engine consumed purely
    through ``spark.sql`` over the registered catalog — every fixture
    table is a temp view (``sources.tables.register_views``) and the
    query is an ANSI SQL string, no DataFrame code in the consumer's
    hands. Catalyst plans it identically to the DataFrame twin
    (``region_revenue_df``; plan equality pinned by
    tests/test_sql_surface.py), so SQL-only users get the same
    broadcast-dim star-join shape. Revenue goes through exact integer
    cents (floor half-up per row, BIGINT sum) — the fuzzer's
    float-free money convention — so the DuckDB oracle is the same
    text modulo nothing: the oracle IS this query.
    """
    from bigdataminingproject_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(REGION_REVENUE_SQL)


def region_revenue_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of ``REGION_REVENUE_SQL`` (same logical plan in,
    same physical plan out — the test asserts operator-for-operator
    equality after normalizing plan ids)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * F.lit(100)
                    + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_cents"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("region")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by total order value (agg-then-join, AQE-sized)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    totals = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        F.count(F.lit(1)).alias("order_count"),
    )
    return (
        totals.join(cust, totals.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            "total_spent",
            "order_count",
        )
        .orderBy(F.desc("total_spent"), "custkey")
        .limit(10)
    )


def q_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer count + account balance stats per nation (broadcast dim)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            stable_avg(F.col("c_acctbal"), 2).alias("avg_acctbal"),
        )
        .orderBy("n_name")
    )


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand part statistics (single-table hash aggregate)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("num_parts"),
            stable_avg(F.col("p_retailprice"), 2).alias("avg_retailprice"),
            F.round(F.avg("p_size"), 2).alias("avg_size"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_brand")
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority within a date range (TPC-H Q4 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_customer_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value — window row_number (O5/O6 shape).

    Bump-chart ranking in the reference uses pandas ``rank(method="first")``
    (plot/bump_chart.py:16-19) ⇒ row_number, not rank; deterministic
    tiebreak on o_orderkey.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "rank_in_customer",
        )
        .orderBy("custkey", "rank_in_customer")
    )


def q_monthly_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average discount and volume by ship month (date_trunc rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            stable_avg(F.col("l_discount"), 4).alias("avg_discount"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("num_items"),
        )
        .orderBy("ship_month")
    )


def q_rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: GROUP BY ROLLUP(status, priority).

    Grouping sets are absent from the reference (SURVEY.md §2.9) but part
    of a complete relational surface; one shuffle, partial+final agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


def q_cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-subtotal view: GROUP BY CUBE(returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("item_count"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
        )
    )


def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-status, per-priority, and grand-total
    subtotals in one pass (neither rollup nor cube — a sparse set list).

    Spark expands grouping sets into a single Expand + hash aggregate:
    one scan, one shuffle, every subtotal from the same partials.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


def q_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts, priorities as rows and statuses as columns.

    ``pivot`` with the value list given explicitly — Spark then skips the
    extra distinct-values job and compiles straight to conditional
    aggregation (one scan, one shuffle), exactly what the SQL oracle
    spells as CASE WHEN.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


def q_nation_customer_supplier_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full outer join of two per-nation aggregates (customers vs
    suppliers) — nations missing from either side keep zero counts."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("num_customers")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("num_suppliers")
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("num_customers", F.lit(0)).alias("num_customers"),
            F.coalesce("num_suppliers", F.lit(0)).alias("num_suppliers"),
        )
        .orderBy("nationkey")
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders since 1999 (NOT EXISTS shape).

    The date predicate restricts the right side BEFORE the anti join —
    pushed into the orders scan — and makes the result non-empty at every
    test SF (the synthetic data gives every customer at least one order
    overall, which would make an unrestricted anti join a vacuous 0-row
    check).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left_anti"
        )
        .select(F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment")
        .orderBy("custkey")
    )


def q_brands_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: parts with at least one lineitem, counted per brand."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("shipped_parts"))
        .orderBy("p_brand")
    )


def q_custkeys_1997_not_1998(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers active in 1997 but not in 1998 (EXCEPT)."""
    orders = load_table(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))

    # subtract = EXCEPT (set semantics): any 1998 activity removes the key
    return active(1997).subtract(active(1998)).orderBy("custkey")


def q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with EXISTS late lineitem, counted by
    priority. Correlated EXISTS compiles to a left-semi join on
    (orderkey, shipdate > orderdate + 60 days)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_events_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day (A12 exact; HLL variant in sketches)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("event_day"))
        .agg(
            F.count_distinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .orderBy("event_day")
    )


def q6_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue from discounted small-quantity items.

    Pure scan+filter+agg — every predicate pushes into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("item_count"),
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue of returned items."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"), "c_name", "n_name"
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


def q_status_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value distribution per status: exact interpolated quantiles.

    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` use the
    same linear interpolation — verified bit-equal on this data.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


def q_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user (lag over event order)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("ts_ms", F.unix_millis("ts"))
        .withColumn("gap_ms", F.col("ts_ms") - F.lag("ts_ms").over(w))
        .filter(F.col("gap_ms").isNotNull())
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.sum("gap_ms") / F.count(F.lit(1)), 2).alias("avg_gap_ms"),
            F.max("gap_ms").alias("max_gap_ms"),
        )
        .orderBy("user_id")
    )
