"""Distributed global row numbering vs the single-partition window."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.plans.ordering import with_global_position


def test_matches_plain_window(spark):
    df = (
        spark.range(0, 5000)
        .withColumn("key", (F.col("id") * 2654435761) % 100003)  # shuffled
        .repartition(13)
    )
    got = {
        r["key"]: r["pos"]
        for r in with_global_position(df, "key", pos_col="pos").collect()
    }
    want = {
        r["key"]: r["pos"]
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy("key"))
        ).collect()
    }
    assert got == want


def test_nulls_last_ordering(spark):
    rows = [(1, 10), (2, None), (3, 5), (4, None)]
    df = spark.createDataFrame(rows, "id long, t long")
    out = {
        r["id"]: r["pos"]
        for r in with_global_position(
            df, "t", tiebreakers=[F.col("id")], pos_col="pos"
        ).collect()
    }
    assert out == {3: 1, 1: 2, 2: 3, 4: 4}


def test_no_single_partition_global_sort(spark):
    from bigdataminingproject_spark.plans.explain import formatted_plan

    df = spark.range(0, 1000).withColumn("k", F.col("id") % 97)
    plan = formatted_plan(
        with_global_position(df, "k", tiebreakers=[F.col("id")], pos_col="pos")
    )
    # numbering runs per-bucket (hash on _bkt), never a single partition
    assert "hashpartitioning(_bkt" in plan


def test_zorder_key_interleaves_bits(spark):
    """Morton key of small constants matches the hand-computed
    interleave: a=0b11, b=0b01 -> z = 0b0111 = 7."""
    from bigdataminingproject_spark.plans.ordering import zorder_key
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        zorder_key(F.lit(3).cast("long"), F.lit(1).cast("long"), 4).alias(
            "z"
        )
    )
    assert df.collect()[0]["z"] == 7


def test_zorder_buckets_bound_both_dims(spark, sf_dir):
    """Every Z-bucket's envelope must be tighter than the global range
    on BOTH dimensions for most buckets — the property that makes
    min/max file stats prune on either predicate after a Z-ORDER
    rewrite. A single-column sort would leave the second dimension's
    envelope at ~full width in every file."""
    from bigdataminingproject_spark.plans.ordering import (
        zorder_layout_stats,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = zorder_layout_stats(li, "l_partkey", "l_suppkey").collect()
    ga = max(r["a_max"] for r in rows) - min(r["a_min"] for r in rows)
    gb = max(r["b_max"] for r in rows) - min(r["b_min"] for r in rows)
    tight_a = sum(1 for r in rows if (r["a_max"] - r["a_min"]) <= ga / 2)
    tight_b = sum(1 for r in rows if (r["b_max"] - r["b_min"]) <= gb / 2)
    assert tight_a >= len(rows) * 0.8
    assert tight_b >= len(rows) * 0.8

def test_grouped_position_matches_partitioned_window(spark):
    """grouped_position must land on the identical ranking as the
    textbook row_number() OVER (PARTITION BY grp ORDER BY v, id),
    including ties on v broken by the tiebreaker."""
    from bigdataminingproject_spark.plans.ordering import grouped_position

    df = (
        spark.range(0, 3000)
        .select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("grp"),
            ((F.col("id") * 2654435761) % 50).alias("v"),  # heavy ties
        )
        .repartition(11)
    )
    got = {
        (r["grp"], r["id"]): r["step"]
        for r in grouped_position(
            df, "grp", "v", tiebreakers=[F.col("id")], pos_col="step"
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("v", "id")
    want = {
        (r["grp"], r["id"]): r["step"]
        for r in df.withColumn("step", F.row_number().over(w)).collect()
    }
    assert got == want


def test_grouped_position_no_per_group_window(spark):
    """The plan must hash-partition on the quantile bucket, never on
    the group column — the whole point is that a FULL per-group
    ranking does not serialize through one task per group."""
    from bigdataminingproject_spark.plans.explain import formatted_plan
    from bigdataminingproject_spark.plans.ordering import grouped_position

    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 17).alias("v"),
    )
    plan = formatted_plan(
        grouped_position(df, "grp", "v", tiebreakers=[F.col("id")])
    )
    assert "hashpartitioning(_bkt" in plan
    # a textbook per-group ranking would show a window PARTITIONED by
    # grp and ordered by the value — windowspecdefinition(grp#N, v#M
    # ASC ...). The bounded one-row-per-group windows in this plan
    # only ORDER by grp (windowspecdefinition(grp#N ASC ...)).
    import re

    assert not re.search(r"windowspecdefinition\(grp#\d+, ", plan)
