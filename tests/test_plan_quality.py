"""Plan-quality gates: the physical plans must carry the properties the
100 TB posture depends on (pushdown, pruning, broadcast, codegen)."""

from __future__ import annotations

import pytest

from bigdataminingproject_spark.operators import relational
from bigdataminingproject_spark.plans.explain import (
    broadcast_join_count,
    has_whole_stage_codegen,
    pushed_filters,
    read_schemas,
    uses_take_ordered,
)


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reaches the parquet reader


def test_q1_column_pruning(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    schemas = read_schemas(df)
    assert schemas, "no ReadSchema found"
    # only the 7 needed columns, not all 11
    assert "l_orderkey" not in schemas[0]
    assert "l_quantity" in schemas[0]


def test_q3_broadcasts_dimension(spark, sf_dir):
    df = relational.q3_shipping_priority(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    pushed = " ".join(pushed_filters(df))
    assert "c_mktsegment" in pushed and "l_shipdate" in pushed


def test_q5_all_dims_broadcast(spark, sf_dir):
    df = relational.q5_region_revenue(spark, sf_dir)
    # customer, supplier, nation⋈region → at least 3 broadcast joins;
    # the only shuffle join is the lineitem⋈orders fact join
    assert broadcast_join_count(df) >= 3


def test_top_customers_uses_take_ordered(spark, sf_dir):
    df = relational.q_top_customers(spark, sf_dir)
    assert uses_take_ordered(df)  # top-k, not a global sort


def test_whole_stage_codegen_active(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    assert has_whole_stage_codegen(df)


def test_events_scan_prunes_unused_columns(spark, sf_dir):
    from bigdataminingproject_spark.operators.events import q_events_top_users

    df = q_events_top_users(spark, sf_dir)
    schemas = " ".join(read_schemas(df))
    assert "props" not in schemas  # unused JSON column never read
