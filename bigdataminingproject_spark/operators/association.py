"""Association-rule mining over document token baskets (Agrawal &
Srikant, "Fast Algorithms for Mining Association Rules", VLDB'94 —
support / confidence / lift for co-occurring items): the classic
"data mining" workload, here with documents as transactions and their
distinct tokens as items (north-star; the reference's frequency
analytics never relate items to each other).

Scale shape — the Apriori pruning is what keeps the pair join sane:

1. Baskets: explode + distinct -> one (doc, item) row per distinct
   item per doc. One shuffle.
2. Item supports: hash-agg to the vocabulary-sized relation, then the
   ``min_support`` cut BEFORE any pair is formed (the Apriori
   monotonicity argument: a pair can't be frequent if either item
   isn't). The surviving item list is broadcast back as a semi-join
   filter, so the pair join's per-doc fanout is C(k,2) over FREQUENT
   items only — bounded by the support threshold, not by document
   length.
3. Pair supports: within-doc self-join on doc_id (item_a < item_b),
   hash-agg on the pair. Both sides carry only frequent items.
4. Rules: each frequent pair emits X=>Y and Y=>X; confidence and lift
   are exact-integer ratios (supports are counts), rounded half-up at
   4 dp via the engine-stable quotient.

Parity: counts exact; confidence = support(XY)/support(X) and lift =
support(XY)*N / (support(X)*support(Y)) both computed as stable
half-up 4 dp divisions of integer products.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.numeric import stable_round_div
from bigdataminingproject_spark.functions.text import (
    remove_stopwords,
    tokenize,
)
from bigdataminingproject_spark.sources.tables import load_table


def token_baskets(docs: DataFrame) -> DataFrame:
    """One (doc_id, item) row per distinct cleaned token per doc."""
    return (
        docs.select(
            "doc_id",
            F.explode(remove_stopwords(tokenize(F.col("text")))).alias(
                "item"
            ),
        )
        .distinct()
    )


def association_rules(
    baskets: DataFrame,
    n_baskets_col: str = "doc_id",
    min_support: float = 0.1,
    min_confidence: float = 0.3,
) -> DataFrame:
    """Mine all 1->1 rules meeting the support/confidence floors.

    ``baskets``: (doc_id, item) distinct rows. Output: antecedent,
    consequent, pair_support (count), confidence, lift — ordered by
    (lift desc, antecedent, consequent).
    """
    n_total = baskets.select(n_baskets_col).distinct().count()
    # ceil, not floor: support(X) >= min_support means count >=
    # ceil(min_support * N); truncation would admit items strictly
    # below the floor (e.g. 2/7 at min_support=0.3). Oracle mirrors.
    min_count = math.ceil(min_support * n_total)
    item_support = baskets.groupBy("item").agg(
        F.count(F.lit(1)).alias("item_n")
    )
    frequent = item_support.filter(F.col("item_n") >= min_count)
    # Apriori prune: only frequent items enter the pair join
    fb = baskets.join(F.broadcast(frequent), "item")
    a = fb.select(
        F.col(n_baskets_col).alias("_d"),
        F.col("item").alias("item_a"),
        F.col("item_n").alias("n_a"),
    )
    b = fb.select(
        F.col(n_baskets_col).alias("_d"),
        F.col("item").alias("item_b"),
        F.col("item_n").alias("n_b"),
    )
    pairs = (
        a.join(b, "_d")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= min_count)
    )
    fwd = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_n",
        F.col("n_a").alias("n_ante"),
        F.col("n_b").alias("n_cons"),
    )
    rev = pairs.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        "pair_n",
        F.col("n_b").alias("n_ante"),
        F.col("n_a").alias("n_cons"),
    )
    rules = fwd.unionByName(rev).select(
        "antecedent",
        "consequent",
        F.col("pair_n").alias("pair_support"),
        stable_round_div(F.col("pair_n"), F.col("n_ante"), 4).alias(
            "confidence"
        ),
        stable_round_div(
            F.col("pair_n") * F.lit(n_total),
            F.col("n_ante") * F.col("n_cons"),
            4,
        ).alias("lift"),
    )
    return rules.filter(F.col("confidence") >= min_confidence).orderBy(
        F.desc("lift"), "antecedent", "consequent"
    )


def q_doc_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->1 association rules over document token baskets
    (min_support 0.3, min_confidence 0.5)."""
    docs = load_table(spark, sf_dir, "documents")
    return association_rules(
        token_baskets(docs), min_support=0.3, min_confidence=0.5
    )
