"""Salted-join semantics: identical results to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataminingproject_spark.plans.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: one hot key with 90% of rows
    left = spark.createDataFrame(
        [(1 if i < 900 else i % 50, i) for i in range(1000)], "k int, v int"
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(50)], "k int, name string")
    plain = plain_sorted = sorted(
        (r["k"], r["v"], r["name"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, "k", salt=8).collect()
    )
    assert salted == plain_sorted
    assert len(salted) == 1000  # every left row matched exactly once


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, name string")
    rows = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, "k", salt=4, how="left").collect()
    }
    assert rows == {(1, "a", "x"), (99, "b", None)}
