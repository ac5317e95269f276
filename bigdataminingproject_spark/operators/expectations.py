"""Declarative data-quality expectations — the Deequ-style constraint
suite (Schelter et al., VLDB '18: "Automating Large-Scale Data Quality
Verification") the platform runs as a release gate.

The existing audit surface (plans/audit.py) answers "what does the
data look like" (profiler) and "do the keys resolve" (FK audit); this
module answers "does the data satisfy the CONTRACT": a list of named
constraints — completeness, uniqueness, domain membership, range,
aggregate bounds — each reduced to one METRIC expression and a
THRESHOLD predicate, evaluated for the whole suite in ONE scan.

Scale shape: every metric is a conditional aggregate (sum/count/min/
max of codegen expressions), so N constraints compile to a single
hash-agg pass over the table — the scan cost of a release gate is one
read no matter how many rules the contract grows (uniqueness rides the
same pass as a count_distinct; Catalyst plans the multi-distinct agg
with its standard Expand). The wide one-row result explodes
driver-side into the (constraint, metric, threshold, passed) report —
O(#rules), never O(rows).

Parity: metrics are exact integer counts or 6-dp-rounded ratios of
exact integer counts; the only doubles are those pinned ratios and
native min/max, so the report hashes identically on any engine.

No reference counterpart (the reference stops at per-run summary JSON,
run_detectors.py:227-241) — platform-QA member of the audit family.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.sources.tables import load_table


@dataclass(frozen=True)
class Expectation:
    """One named constraint: ``metric`` (an aggregate Column producing
    a double) compared against ``threshold`` with ``op`` ('>=', '<=',
    '==')."""

    name: str
    metric: Column
    op: str
    threshold: float


def completeness(col: str) -> Column:
    """Non-null fraction, 6 dp (exact integer counts under the round)."""
    return F.round(
        F.count(F.col(col)).cast("double")
        / F.count(F.lit(1)).cast("double"),
        6,
    )


def uniqueness(col: str) -> Column:
    """distinct/total fraction, 6 dp — 1.0 iff the column is a key."""
    return F.round(
        F.count_distinct(F.col(col)).cast("double")
        / F.count(F.lit(1)).cast("double"),
        6,
    )


def domain_rate(col: str, allowed: tuple[str, ...]) -> Column:
    """Fraction of non-null values inside the allowed set, 6 dp."""
    return F.round(
        F.sum(
            F.when(F.col(col).isin(*allowed), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).cast("double")
        / F.count(F.col(col)).cast("double"),
        6,
    )


def evaluate_expectations(
    df: DataFrame, specs: list[Expectation]
) -> DataFrame:
    """Evaluate the whole suite in one scan. Returns one row per
    rule: (rule, metric, op, threshold, passed int),
    ordered by constraint name."""
    spark = df.sparkSession
    if not specs:
        return spark.createDataFrame(
            [],
            "rule string, metric double, op string, "
            "threshold double, passed int",
        )
    wide = df.agg(
        *[
            s.metric.cast("double").alias(f"m_{i}")
            for i, s in enumerate(specs)
        ]
    )
    comparators = {
        ">=": lambda m, t: m >= t,
        "<=": lambda m, t: m <= t,
        "==": lambda m, t: m == t,
    }
    entries = F.array(
        *[
            F.struct(
                F.lit(s.name).alias("rule"),
                F.col(f"m_{i}").alias("metric"),
                F.lit(s.op).alias("op"),
                F.lit(float(s.threshold)).alias("threshold"),
                F.when(
                    comparators[s.op](
                        F.col(f"m_{i}"), F.lit(float(s.threshold))
                    ),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .alias("passed"),
            )
            for i, s in enumerate(specs)
        ]
    )
    return (
        wide.select(F.explode(entries).alias("e"))
        .select("e.rule", "e.metric", "e.op", "e.threshold", "e.passed")
        .orderBy("rule")
    )


# The orders-table release contract (mirrored literally by the oracle).
ORDER_STATUSES = ("O", "F", "P")
ORDER_PRIORITIES = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)


def orders_contract() -> list[Expectation]:
    return [
        Expectation(
            "orderkey_unique", uniqueness("o_orderkey"), "==", 1.0
        ),
        Expectation(
            "custkey_complete", completeness("o_custkey"), ">=", 0.999
        ),
        Expectation(
            "status_in_domain",
            domain_rate("o_orderstatus", ORDER_STATUSES),
            "==",
            1.0,
        ),
        Expectation(
            "priority_in_domain",
            domain_rate("o_orderpriority", ORDER_PRIORITIES),
            "==",
            1.0,
        ),
        Expectation(
            "totalprice_positive",
            F.min(F.col("o_totalprice")).cast("double"),
            ">=",
            0.01,
        ),
        Expectation(
            "orderdate_complete",
            completeness("o_orderdate"),
            ">=",
            0.95,
        ),
    ]


def q_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders release contract: 6 named constraints, one scan."""
    orders = load_table(spark, sf_dir, "orders")
    return evaluate_expectations(orders, orders_contract())


def expectations_oracle_sql() -> str:
    """DuckDB mirror of ``q_orders_expectations`` — the same six
    conditional aggregates in one pass, unpivoted with UNION ALL
    (report column is ``rule`` — ``constraint`` is reserved in DuckDB)."""
    statuses = ", ".join(f"'{s}'" for s in ORDER_STATUSES)
    prios = ", ".join(f"'{p}'" for p in ORDER_PRIORITIES)
    return f"""
WITH m AS (
    SELECT
        round(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6) AS m_unique,
        round(CAST(count(o_custkey) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6) AS m_cust,
        round(CAST(sum(CASE WHEN o_orderstatus IN ({statuses})
                            THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(count(o_orderstatus) AS DOUBLE), 6) AS m_status,
        round(CAST(sum(CASE WHEN o_orderpriority IN ({prios})
                            THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(count(o_orderpriority) AS DOUBLE), 6) AS m_prio,
        CAST(min(o_totalprice) AS DOUBLE) AS m_price,
        round(CAST(count(o_orderdate) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6) AS m_date
    FROM orders
)
SELECT * FROM (
    SELECT 'custkey_complete' AS rule, m_cust AS metric,
           '>=' AS op, CAST(0.999 AS DOUBLE) AS threshold,
           CASE WHEN m_cust >= 0.999 THEN 1 ELSE 0 END AS passed
    FROM m
    UNION ALL
    SELECT 'orderdate_complete', m_date, '>=', CAST(0.95 AS DOUBLE),
           CASE WHEN m_date >= 0.95 THEN 1 ELSE 0 END FROM m
    UNION ALL
    SELECT 'orderkey_unique', m_unique, '==', CAST(1.0 AS DOUBLE),
           CASE WHEN m_unique = 1.0 THEN 1 ELSE 0 END FROM m
    UNION ALL
    SELECT 'priority_in_domain', m_prio, '==', CAST(1.0 AS DOUBLE),
           CASE WHEN m_prio = 1.0 THEN 1 ELSE 0 END FROM m
    UNION ALL
    SELECT 'status_in_domain', m_status, '==', CAST(1.0 AS DOUBLE),
           CASE WHEN m_status = 1.0 THEN 1 ELSE 0 END FROM m
    UNION ALL
    SELECT 'totalprice_positive', m_price, '>=', CAST(0.01 AS DOUBLE),
           CASE WHEN m_price >= 0.01 THEN 1 ELSE 0 END FROM m
)
ORDER BY rule"""


# ---------------------------------------------------------------------------
# Counter-form state (the streaming twin's mergeable representation)
# ---------------------------------------------------------------------------


def orders_scalar_partial(df: DataFrame) -> DataFrame:
    """One-row additive partial of every non-distinct metric
    ingredient in the orders contract: integer counts + one min.
    Closed under (sum, ..., min) folding, so any batch slicing
    rebuilds the exact corpus ingredients."""
    statuses = ORDER_STATUSES
    prios = ORDER_PRIORITIES
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("nn_cust"),
        F.sum(
            F.when(F.col("o_orderstatus").isin(*statuses), 1).otherwise(0)
        ).alias("n_status_ok"),
        F.count("o_orderstatus").alias("nn_status"),
        F.sum(
            F.when(F.col("o_orderpriority").isin(*prios), 1).otherwise(0)
        ).alias("n_prio_ok"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.min("o_totalprice").alias("min_price"),
        F.count("o_orderdate").alias("nn_date"),
    )


def fold_scalar_partials(parts: DataFrame) -> DataFrame:
    """LSM merge-operator: stacked one-row partials collapse by
    integer addition (and min for the range metric)."""
    return parts.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("nn_cust").alias("nn_cust"),
        F.sum("n_status_ok").alias("n_status_ok"),
        F.sum("nn_status").alias("nn_status"),
        F.sum("n_prio_ok").alias("n_prio_ok"),
        F.sum("nn_prio").alias("nn_prio"),
        F.min("min_price").alias("min_price"),
        F.sum("nn_date").alias("nn_date"),
    )


def orders_report_from_counters(
    scalars: DataFrame, n_distinct_orderkeys: DataFrame
) -> DataFrame:
    """Rebuild the EXACT contract report from folded counter state —
    bit-identical to ``q_orders_expectations`` on the raw rows,
    because every metric is the same pinned 6-dp quotient of the same
    exact integers (or the same native min). ``scalars`` is the
    folded one-row partial; ``n_distinct_orderkeys`` one row (nd
    bigint) from the keyed counter relation."""
    row = scalars.crossJoin(n_distinct_orderkeys)
    ops = {s.name: (s.op, s.threshold) for s in orders_contract()}
    metrics = {
        "orderkey_unique": F.round(
            F.col("nd").cast("double") / F.col("n_rows").cast("double"),
            6,
        ),
        "custkey_complete": F.round(
            F.col("nn_cust").cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ),
        "status_in_domain": F.round(
            F.col("n_status_ok").cast("double")
            / F.col("nn_status").cast("double"),
            6,
        ),
        "priority_in_domain": F.round(
            F.col("n_prio_ok").cast("double")
            / F.col("nn_prio").cast("double"),
            6,
        ),
        "totalprice_positive": F.col("min_price").cast("double"),
        "orderdate_complete": F.round(
            F.col("nn_date").cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ),
    }
    comparators = {
        ">=": lambda m, t: m >= t,
        "<=": lambda m, t: m <= t,
        "==": lambda m, t: m == t,
    }
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                m.cast("double").alias("metric"),
                F.lit(ops[name][0]).alias("op"),
                F.lit(float(ops[name][1])).alias("threshold"),
                F.when(
                    comparators[ops[name][0]](
                        m.cast("double"), F.lit(float(ops[name][1]))
                    ),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .alias("passed"),
            )
            for name, m in metrics.items()
        ]
    )
    return (
        row.select(F.explode(entries).alias("e"))
        .select("e.rule", "e.metric", "e.op", "e.threshold", "e.passed")
        .orderBy("rule")
    )
