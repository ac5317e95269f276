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


def test_no_single_partition_exchange_over_fact_scans(spark, sf_dir):
    """No plan may funnel unaggregated fact-table rows through an
    Exchange SinglePartition — the one shape that cannot survive a 100x
    scale-up. Single-partition windows are allowed only above a reducing
    aggregate (one row per bucket), which is exactly what the helper
    checks. Covers the window-bearing queries plus a sanity slice of the
    relational tier."""
    from bigdataminingproject_spark.operators import dedup, events, snapshots
    from bigdataminingproject_spark.plans.explain import (
        unsafe_single_partition_exchanges,
    )

    checked = {
        "q_doc_snapshots": snapshots.q_doc_snapshots,
        "q_doc_topk_cumulative": snapshots.q_doc_topk_cumulative,
        "q_doc_burst": snapshots.q_doc_burst,
        "q_dup_scores": dedup.q_dup_scores,
        "q_ngram_jaccard": dedup.q_ngram_jaccard,
        "q_events_time_rollup": events.q_events_time_rollup,
        "q_customer_order_rank": relational.q_customer_order_rank,
        "q1_pricing_summary": relational.q1_pricing_summary,
    }
    for name, fn in checked.items():
        offenders = unsafe_single_partition_exchanges(fn(spark, sf_dir))
        assert not offenders, f"{name}: SinglePartition over fact scan {offenders}"


def test_q7_pushdown_and_double_nation_broadcast(spark, sf_dir):
    from bigdataminingproject_spark.operators import tpch

    df = tpch.q7_volume_shipping(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed  # date slice reaches the fact scan
    # nation enters twice (supp/cust roles) — both must broadcast
    assert broadcast_join_count(df) >= 2


def test_q9_like_filter_pushed_to_part_scan(spark, sf_dir):
    from bigdataminingproject_spark.operators import tpch

    df = tpch.q9_profit_by_nation(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "p_name" in pushed  # StringContains pushed to parquet


def test_q18_top100_uses_take_ordered(spark, sf_dir):
    from bigdataminingproject_spark.operators import tpch

    df = tpch.q18_large_orders(spark, sf_dir)
    assert uses_take_ordered(df)  # top-100, never a global sort


def test_q19_lineitem_scan_pruned(spark, sf_dir):
    from bigdataminingproject_spark.operators import tpch

    df = tpch.q19_disjunctive_revenue(spark, sf_dir)
    schemas = " ".join(read_schemas(df))
    assert "l_shipdate" not in schemas  # unused fact columns never read
    assert "l_comment" not in schemas


def test_tpch_suite_no_single_partition_over_facts(spark, sf_dir):
    """Q21's per-order window and Q15/Q22's scalar-aggregate broadcasts
    must never funnel unaggregated fact rows through one partition."""
    from bigdataminingproject_spark.operators import tpch
    from bigdataminingproject_spark.plans.explain import (
        unsafe_single_partition_exchanges,
    )

    for name, fn in {
        "q13_order_distribution": tpch.q13_order_distribution,
        "q15_top_supplier": tpch.q15_top_supplier,
        "q17_small_qty_revenue": tpch.q17_small_qty_revenue,
        "q21_late_sole_shippers": tpch.q21_late_sole_shippers,
        "q22_idle_customers": tpch.q22_idle_customers,
    }.items():
        offenders = unsafe_single_partition_exchanges(fn(spark, sf_dir))
        assert not offenders, f"{name}: SinglePartition over fact scan {offenders}"


def test_registry_wide_plan_audit(spark, sf_dir):
    """EVERY registry query's physical plan is audited for the two
    shapes that cannot survive a 100x scale-up: an Exchange
    SinglePartition over unaggregated fact rows, and a shuffle
    CartesianProduct. Declared exceptions only:

    - q_embedding_neardup_anchor: the exact all-pairs verifier — kept as the
      LSH oracle anchor, documented non-scalable in its docstring.

    (BroadcastNestedLoopJoin is allowed: in this engine it only ever
    carries 1-row scalar-aggregate build sides — Q11/Q15/Q22 cutoffs,
    mixture totals — or the declared-bounded kNN query set.)
    """
    import __spark_entry__ as entrymod

    from bigdataminingproject_spark.plans.explain import (
        formatted_plan,
        unsafe_single_partition_exchanges,
    )

    declared_cartesian = {"q_embedding_neardup_anchor"}
    failures = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        offenders = unsafe_single_partition_exchanges(df)
        if offenders:
            failures.append(f"{name}: SinglePartition over facts {offenders}")
        if name not in declared_cartesian:
            if "CartesianProduct" in formatted_plan(df):
                failures.append(f"{name}: undeclared CartesianProduct")
    assert not failures, "\n".join(failures)


def test_single_partition_detector_catches_bad_plan(spark, sf_dir):
    """The detector itself must flag the anti-pattern (guard against a
    regex that silently matches nothing)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bigdataminingproject_spark.plans.explain import (
        unsafe_single_partition_exchanges,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bad = docs.withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    assert unsafe_single_partition_exchanges(bad)


def test_time_rollup_one_scan_one_agg_exchange(spark, sf_dir):
    """time_rollup must stay the grouping-sets shape: ONE fact scan and
    at most 2 exchanges (grouping-set aggregate + final sort). The
    round-2 chained-union formulation planned 3 scans / 7 exchanges
    because ReuseExchange never fires across union branches with
    distinct attribute ids — this pins the fix."""
    from bigdataminingproject_spark.operators.events import (
        q_events_time_rollup,
    )

    df = q_events_time_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") == 1, "fact table scanned >1x"
    n_exchange = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchange <= 2, f"{n_exchange} exchanges; expected <=2"
    assert "Expand" in plan  # grouping-sets expand, not a union


def test_rank_filters_get_partial_window_group_limit(spark, sf_dir):
    """domain_cap and latest_by_key rely on Catalyst's
    InferWindowGroupLimit for their skew envelope: the PARTIAL
    group-limit before the exchange caps what a hot stratum/key ships
    to its final window task at (cap x map partitions) rows,
    independent of the hot key's size (measured flat at 10x with a
    50%-hot key — tools/skew_probe.py). This pins the Partial/Final
    pair so a config or shape change that silently disables the rule
    fails loudly."""
    from bigdataminingproject_spark.operators.events import (
        q_events_latest_state,
    )
    from bigdataminingproject_spark.operators.sampling import (
        q_doc_domain_cap,
    )

    for q in (q_doc_domain_cap, q_events_latest_state):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, q.__name__
        assert "Partial" in plan and "Final" in plan, q.__name__


def test_round4_map_only_signals_have_no_agg_exchange(spark, sf_dir):
    """blocklist_signals and chunk_documents are pure projections: the
    only exchange allowed in their plans is the final presentation
    sort. A groupBy/join sneaking into either would show up as a
    second exchange here before it shows up as a 100 TB shuffle."""
    from bigdataminingproject_spark.operators.packing import q_doc_chunks
    from bigdataminingproject_spark.operators.quality import q_doc_blocklist

    for q in (q_doc_blocklist, q_doc_chunks):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("documents.parquet") == 1, q.__name__
        n_exchange = plan.count("Exchange") - plan.count("ReusedExchange")
        assert n_exchange <= 1, f"{q.__name__}: {n_exchange} exchanges"


def test_pmi_totals_reuse_aggregation_exchanges(spark, sf_dir):
    """pmi_collocations derives its scalar totals from the unigram /
    bigram count relations instead of re-scanning the corpus; AQE must
    materialize each aggregation exchange once (ReusedExchange in the
    executed plan). Pins the round-4 rewrite that took the plan from
    four tokenizing scans to two."""
    from bigdataminingproject_spark.operators.frequency import (
        q_doc_pmi_collocations,
    )

    df = q_doc_pmi_collocations(spark, sf_dir)
    df.collect()  # AQE reuse is a runtime decision
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
