"""Item-item collaborative similarity (co-occurrence cosine top-k).

The classic Amazon-style item-to-item recommender statistic (Linden,
Smith & York, IEEE Internet Computing '03): two parts are similar when
the orders that contain them overlap — cosine over binary basket
vectors, cos(a,b) = co(a,b) / sqrt(n(a) * n(b)).

Scale shape (the part that matters at 100 TB):

  * baskets dedup to distinct (order, part) — one shuffle;
  * pairs enumerate WITHIN an order only (C(items, 2) per order, a
    small constant for retail-shaped baskets), never across orders —
    the item-catalog never self-joins;
  * a minimum co-occurrence floor prunes the long tail of
    coincidental pairs BEFORE the similarity math, bounding the pair
    relation at catalog-adjacency size (same discipline as the
    co-occurrence token graph, operators/graph.py);
  * top-k per item is a bounded window over each item's surviving
    neighbor list.

Determinism: co / n(a) / n(b) are exact integers, cosine is one IEEE
sqrt + divide of those integers (bit-identical on any engine), and the
per-item ranking tie-breaks on neighbor id.

No reference counterpart (the reference has no recommendation surface);
north-star corpus-analytics family alongside graph.py / kcore.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table

SIM_MIN_CO = 2  # co-occurrence floor (orders), prunes coincidences
SIM_TOP_K = 5


def basket_pair_counts(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int = SIM_MIN_CO,
) -> DataFrame:
    """Floored within-basket pair counts ``(a < b, c)`` — the shared
    pair-enumeration substrate: one dedup shuffle, one within-basket
    self-join (per-basket fanout C(items, 2)), one pair hash-agg, the
    ``c >= min_co`` coincidence floor. The recommender consumes the
    counts; the graph family (kcore.copurchase_edges) drops them —
    ONE implementation keeps the two substrates provably identical."""
    bi = baskets.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("p")
    ).distinct()
    lo = bi.select("o", F.col("p").alias("a"))
    hi = bi.select("o", F.col("p").alias("b"))
    return (
        lo.join(hi, "o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_co)
    )


def item_cosine_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = SIM_TOP_K,
    min_co: int = SIM_MIN_CO,
) -> DataFrame:
    """Top-``k`` cosine neighbors per item from a (basket, item)
    relation. Returns (item, neighbor, co_count, cos_sim, rank) with
    rank 1..k per item by (cos_sim desc, neighbor asc).
    """
    bi = baskets.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("p")
    ).distinct()
    n = bi.groupBy("p").agg(F.count(F.lit(1)).alias("n_orders"))
    co = basket_pair_counts(
        baskets, basket_col, item_col, min_co
    ).withColumnRenamed("c", "co_count")
    return cosine_topk_from_counts(co, n, k)


def cosine_topk_from_counts(
    co: DataFrame, n: DataFrame, k: int = SIM_TOP_K
) -> DataFrame:
    """Scoring tail shared by the batch operator and the streaming
    maintenance twin: from floored pair counts ``(a < b, co_count)``
    and item marginals ``(p, n_orders)``, produce the per-item top-k.
    All inputs are exact integers, so the single sqrt+divide per pair
    is bit-identical on any engine."""
    # credit both directions, then attach the two marginals
    sym = co.select("a", "b", "co_count").unionAll(
        co.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "co_count"
        )
    )
    scored = (
        sym.join(n.select(F.col("p").alias("a"), F.col("n_orders").alias("na")), "a")
        .join(n.select(F.col("p").alias("b"), F.col("n_orders").alias("nb")), "b")
        .select(
            F.col("a").alias("item"),
            F.col("b").alias("neighbor"),
            "co_count",
            (
                F.col("co_count")
                / F.sqrt(F.col("na").cast("double") * F.col("nb"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cos_sim"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("item", "rank")
    )


def q_part_itemsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 co-purchase cosine neighbors per part (floor: 2 shared
    orders) — the item-item recommender statistic over the TPC-H
    basket relation."""
    li = load_table(spark, sf_dir, "lineitem")
    return item_cosine_topk(li, "l_orderkey", "l_partkey")
