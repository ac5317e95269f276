"""Bucketed co-located joins eliminate the join shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.plans.explain import shuffle_exchange_count
from bigdataminingproject_spark.sources.bucketing import (
    co_located_join,
    write_bucketed,
)
from bigdataminingproject_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(li, "b_lineitem", "o_orderkey", num_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = co_located_join(spark, lt, rt, "o_orderkey").groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # the JOIN itself is exchange-free; the one remaining exchange is the
    # aggregation's (which is unavoidable and tiny)
    assert shuffle_exchange_count(joined) <= 1


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(li, "o_orderkey")
        assert shuffle_exchange_count(joined) >= 2  # both sides shuffle
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_results_match(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed_n = co_located_join(spark, lt, rt, "o_orderkey").count()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain_n = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert bucketed_n == plain_n
