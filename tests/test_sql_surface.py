"""SQL API surface: ``spark.sql`` over registered views must agree with
the DataFrame formulations.

A user of the engine can register the star schema as views
(``sources.tables.register_views``) and run plain ANSI SQL; Catalyst
compiles both surfaces to the same plans, so results must match the
DataFrame queries row for row. This pins that equivalence for a
representative query of each family (agg, join+top-k, window rank).
"""

from __future__ import annotations

import pytest

from bigdataminingproject_spark.operators import relational
from bigdataminingproject_spark.sources.tables import register_views


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_agg_matches_dataframe(spark, sf_dir):
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        GROUP BY l_returnflag, l_linestatus
    """)
    df = relational.q1_pricing_summary(spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert _rows(sql) == _rows(df)


def test_sql_join_topk_matches_dataframe(spark, sf_dir):
    sql = spark.sql("""
        SELECT c.c_custkey AS custkey, c.c_name,
               round(sum(o.o_totalprice), 2) AS total_spent,
               count(*) AS order_count
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_spent DESC, custkey
        LIMIT 10
    """)
    assert _rows(sql) == _rows(relational.q_top_customers(spark, sf_dir))


def test_sql_window_rank_matches_dataframe(spark, sf_dir):
    sql = spark.sql("""
        SELECT custkey, orderkey, totalprice, rank_in_customer FROM (
            SELECT o_custkey AS custkey, o_orderkey AS orderkey,
                   round(o_totalprice, 2) AS totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rank_in_customer
            FROM orders
        ) WHERE rank_in_customer <= 3
    """)
    df = relational.q_customer_order_rank(spark, sf_dir)
    assert _rows(sql.select(*df.columns)) == _rows(df)


def test_sql_having_semijoin_matches_dataframe(spark, sf_dir):
    """TPC-H Q18 family rep: the spark.sql HAVING-subquery formulation
    must agree with the DataFrame operator's decorrelated plan."""
    from bigdataminingproject_spark.operators import tpch

    sql = spark.sql("""
        SELECT c.c_name, c.c_custkey AS custkey,
               o.o_orderkey AS orderkey, o.o_orderdate,
               round(o.o_totalprice, 2) AS totalprice,
               round(sum(l.l_quantity), 2) AS sum_qty
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
                 o.o_orderdate, o.o_totalprice
        ORDER BY totalprice DESC, orderkey
        LIMIT 100
    """)
    df = tpch.q18_large_orders(spark, sf_dir)
    assert _rows(sql) == _rows(df)


def test_sql_front_door_plan_matches_dataframe_twin(spark, sf_dir):
    """VERDICT r5 #8: the registry's SQL front door entry
    (q_sql_region_revenue) must compile to the SAME physical plan as
    its DataFrame twin — operator for operator, not just same results.
    Plan ids and exchange/subquery numbering are normalized away."""
    import re

    sql_df = relational.q_sql_region_revenue(spark, sf_dir)
    twin = relational.region_revenue_df(spark, sf_dir)

    def _ops(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        ops = []
        for line in plan.splitlines():
            name = re.sub(r"^[^A-Za-z]*", "", line)
            name = re.split(r"[ (]", name)[0]
            if name and name[0].isupper():
                ops.append(name)
        return ops

    assert _ops(sql_df) == _ops(twin)
    assert _rows(sql_df) == _rows(twin)
    # the star join must broadcast the dims, not shuffle the fact side
    plan = sql_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
