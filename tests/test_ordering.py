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
