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
