"""Unit semantics for the declarative expectation suite
(operators/expectations.py) — metric math and threshold gating on tiny
frames; q_orders_expectations carries the DuckDB gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.expectations import (
    Expectation,
    completeness,
    domain_rate,
    evaluate_expectations,
    uniqueness,
)


def _report(df, specs):
    return {
        r["rule"]: (r["metric"], r["passed"])
        for r in evaluate_expectations(df, specs).collect()
    }


def test_completeness_and_uniqueness_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (4, "c")], "k bigint, s string"
    )
    out = _report(
        df,
        [
            Expectation("s_complete", completeness("s"), ">=", 0.9),
            Expectation("k_unique", uniqueness("k"), "==", 1.0),
        ],
    )
    assert out["s_complete"] == (0.75, 0)
    assert out["k_unique"] == (0.75, 0)  # 3 distinct / 4 rows


def test_domain_rate_ignores_nulls_in_denominator(spark):
    df = spark.createDataFrame(
        [("O",), ("F",), (None,), ("X",)], "st string"
    )
    out = _report(
        df,
        [
            Expectation(
                "st_domain", domain_rate("st", ("O", "F")), "==", 1.0
            )
        ],
    )
    # 2 of 3 NON-NULL values in domain
    assert out["st_domain"] == (round(2 / 3, 6), 0)


def test_threshold_operators(spark):
    df = spark.createDataFrame([(5.0,), (10.0,)], "v double")
    out = _report(
        df,
        [
            Expectation("min_ge", F.min("v"), ">=", 5.0),
            Expectation("max_le", F.max("v"), "<=", 9.0),
        ],
    )
    assert out["min_ge"] == (5.0, 1)
    assert out["max_le"] == (10.0, 0)


def test_whole_suite_is_one_scan(spark):
    """All metrics fold into a single aggregate node — the report plan
    must contain no join and only one Exchange chain from the scan."""
    from bigdataminingproject_spark.operators.expectations import (
        orders_contract,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    plan = (
        evaluate_expectations(orders, orders_contract())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_empty_spec_list_yields_empty_report(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    assert evaluate_expectations(df, []).count() == 0


def test_counter_form_rebuilds_batch_report_exactly(spark):
    """Folded scalar partials + keyed counters over ANY batch slicing
    must rebuild the batch report bit-for-bit (the twin's publish
    path)."""
    from bigdataminingproject_spark.operators.expectations import (
        fold_scalar_partials,
        orders_contract,
        orders_report_from_counters,
        orders_scalar_partial,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    batch = evaluate_expectations(orders, orders_contract()).collect()

    slices = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    parts = slices[0].sparkSession.createDataFrame(
        [], orders_scalar_partial(slices[0]).schema
    )
    for s in slices:
        parts = parts.unionByName(orders_scalar_partial(s))
    folded = fold_scalar_partials(parts)
    keyed = None
    for s in slices:
        kp = s.groupBy(F.col("o_orderkey").alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        keyed = kp if keyed is None else keyed.unionByName(kp)
    nd = (
        keyed.groupBy("k")
        .agg(F.sum("c").alias("c"))
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    rebuilt = orders_report_from_counters(folded, nd).collect()
    assert [tuple(r) for r in rebuilt] == [tuple(r) for r in batch]
