"""Decorrelation-rewrite validation for the TPC-H suite.

The driver's oracle SQL intentionally mirrors each query's DECORRELATED
formulation (so both engines execute comparable plans). That leaves a
gap: if a rewrite were semantically wrong, Spark and the oracle would
agree on the same wrong answer. These tests close the gap by running
the TEXTBOOK correlated formulations (scalar subqueries, correlated
EXISTS/NOT EXISTS, HAVING subqueries) in DuckDB at sf0.001 and
comparing against the Spark operators row for row.
"""

from __future__ import annotations

import duckdb
import pytest

from bigdataminingproject_spark.operators import tpch

TABLES = "region nation customer supplier part orders lineitem".split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _ddb_rows(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_q2_correlated_min_subquery(spark, sf_dir, ddb):
    got = _spark_rows(tpch.q2_min_price_part(spark, sf_dir))
    want = _ddb_rows(
        ddb,
        """
        SELECT p.p_type, p.p_partkey AS partkey, p.p_name,
               round(p.p_retailprice, 2) AS retailprice
        FROM part p
        WHERE p.p_size <= 25
          AND p.p_retailprice = (
              SELECT min(p2.p_retailprice) FROM part p2
              WHERE p2.p_type = p.p_type AND p2.p_size <= 25)
        ORDER BY p.p_type, partkey
        """,
    )
    assert got == want


def test_q11_having_scalar_subquery(spark, sf_dir, ddb):
    got = _spark_rows(tpch.q11_part_value_concentration(spark, sf_dir))
    want = _ddb_rows(
        ddb,
        """
        WITH pp AS (
            SELECT l_partkey AS partkey,
                   CAST(round(sum(l_extendedprice * (1 - l_discount))
                              * 10000) AS BIGINT) AS v_tenk
            FROM lineitem GROUP BY l_partkey
        )
        SELECT partkey, v_tenk / 10000.0 AS value
        FROM pp
        WHERE 2 * v_tenk * (SELECT count(*) FROM pp)
              > 3 * (SELECT sum(v_tenk) FROM pp)
        ORDER BY value DESC, partkey
        """,
    )
    assert got == want


def test_q15_scalar_max_subquery(spark, sf_dir, ddb):
    got = _spark_rows(tpch.q15_top_supplier(spark, sf_dir))
    want = _ddb_rows(
        ddb,
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY suppkey
        """,
    )
    assert got == want


def test_q17_correlated_avg_subquery(spark, sf_dir, ddb):
    got = _spark_rows(tpch.q17_small_qty_revenue(spark, sf_dir))
    want = _ddb_rows(
        ddb,
        """
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS item_count
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
              SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey)
        """,
    )
    assert got == want


def test_q20_nested_quantity_subquery(spark, sf_dir, ddb):
    got = _spark_rows(tpch.q20_excess_shippers(spark, sf_dir))
    want = _ddb_rows(
        ddb,
        """
        SELECT s.s_suppkey AS suppkey, s.s_name, s.s_acctbal
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE '%gear%'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l.l_partkey, l.l_suppkey
            HAVING sum(l.l_quantity) > 0.3 * (
                SELECT sum(l3.l_quantity)
                FROM lineitem l3 JOIN part p3
                     ON l3.l_partkey = p3.p_partkey
                WHERE l3.l_partkey = l.l_partkey
                  AND p3.p_name LIKE '%gear%'
                  AND l3.l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l3.l_shipdate < TIMESTAMP '1998-01-01'))
        ORDER BY suppkey
        """,
    )
    assert got == want


def test_q21_exists_not_exists_pair(spark, sf_dir, ddb):
    got = _spark_rows(tpch.q21_late_sole_shippers(spark, sf_dir))
    want = _ddb_rows(
        ddb,
        """
        WITH lo AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   max(CASE WHEN l.l_shipdate >
                                 o.o_orderdate + INTERVAL 90 DAY
                            THEN 1 ELSE 0 END) AS is_late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY l.l_orderkey, l.l_suppkey
        )
        SELECT s.s_name, count(*) AS numwait
        FROM lo l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE l1.is_late = 1
          AND EXISTS (SELECT 1 FROM lo l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lo l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.is_late = 1)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
        """,
    )
    assert got == want


def test_q22_scalar_avg_and_not_exists(spark, sf_dir, ddb):
    got = _spark_rows(tpch.q22_idle_customers(spark, sf_dir))
    want = _ddb_rows(
        ddb,
        """
        SELECT c.c_mktsegment, count(*) AS numcust,
               round(sum(c.c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT avg(c2.c_acctbal) FROM customer c2
                WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """,
    )
    assert got == want
