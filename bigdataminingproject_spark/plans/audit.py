"""Data-quality audits over the warehouse star schema: referential
integrity (orphaned foreign keys) and a single-scan column profiler.

These are the platform-side QA tools a training-data pipeline runs
before every release (north-star; the reference stops at per-run
summary JSON, `run_detectors.py:227-241` — it has no cross-table or
schema-level checks at all).

Scale shape:

- ``fk_audit``: each edge is ONE child scan left-joined against the
  distinct-projected parent key set, folded to a single row of counts.
  Dimension parents (nation, region, part, supplier, customer) are
  broadcast after the distinct projection; the one big-big edge
  (lineitem -> orders) is a plain shuffle join on the key both sides
  are naturally clustered by. Null keys never match a join, so null
  accounting and orphan accounting come from the same joined relation
  — no second scan per edge.
- ``profile_table``: ONE scan. The multi-distinct aggregate compiles
  to a single Expand + hash-agg pass (Catalyst's standard plan for
  n-distinct aggregates); min/max/length stats ride the same pass.
  The wide one-row result is exploded driver-side into the long
  (one-row-per-column) report — O(#columns), not O(rows).

Parity: all outputs are exact integers, strings cast from integers, or
4-dp-rounded ratios of exact integer sums — no float-order sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.numeric import stable_round_div
from bigdataminingproject_spark.sources.tables import load_table

# (edge label, child table, child key, parent table, parent key) — the
# full FK graph of the synthetic star schema (TESTDATA.md).
STAR_SCHEMA_EDGES: tuple[tuple[str, str, str, str, str], ...] = (
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def fk_orphan_stats(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, edge: str
) -> DataFrame:
    """One-row integrity report for a single FK edge.

    Columns: edge, child_rows, null_keys, orphan_rows, ok. A child key
    is an *orphan* when it is non-null and matches no parent key; null
    keys are counted separately (they are absent-by-declaration, not
    dangling). ``ok`` = no orphans and no nulls.
    """
    keys = child.select(F.col(child_key).alias("k"))
    parents = parent.select(F.col(parent_key).alias("k")).distinct().withColumn(
        "hit", F.lit(1)
    )
    joined = keys.join(parents, "k", "left")
    return joined.agg(
        F.lit(edge).alias("edge"),
        F.count(F.lit(1)).alias("child_rows"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("null_keys"),
        F.count(
            F.when(F.col("k").isNotNull() & F.col("hit").isNull(), 1)
        ).alias("orphan_rows"),
    ).withColumn(
        "ok", (F.col("null_keys") == 0) & (F.col("orphan_rows") == 0)
    )


def fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity report over every edge of the star schema,
    one row per edge (see ``STAR_SCHEMA_EDGES``)."""
    tables = {
        name: load_table(spark, sf_dir, name)
        for name in {e[1] for e in STAR_SCHEMA_EDGES}
        | {e[3] for e in STAR_SCHEMA_EDGES}
    }
    out = None
    for edge, child, ckey, parent, pkey in STAR_SCHEMA_EDGES:
        row = fk_orphan_stats(tables[child], ckey, tables[parent], pkey, edge)
        out = row if out is None else out.unionByName(row)
    return out.orderBy("edge")


def q_table_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full FK-graph integrity audit (7 edges, 1 row each)."""
    return fk_audit(spark, sf_dir)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Single-scan column profile: one output row per column with
    non-null count, exact distinct count, min/max (cast to string
    AFTER the native-type aggregate, so ordering stays native), and
    the mean string-rendered length (4 dp).

    Restricted to integer/string columns by contract — float and
    timestamp renderings are engine-specific, and profiling those
    belongs to the typed quantile operators (`operators/sketches.py`).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"max_{c}"),
            stable_round_div(
                F.sum(F.length(s)), F.count(F.col(c)), 4
            ).alias(f"len_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nonnull"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_val"),
                F.col(f"max_{c}").alias("max_val"),
                F.col(f"len_{c}").alias("avg_len"),
            )
            for c in cols
        ]
    )
    return (
        wide.select("n_rows", F.explode(entries).alias("e"))
        .select("e.col_name", "n_rows", "e.n_nonnull", "e.n_distinct",
                "e.min_val", "e.max_val", "e.avg_len")
        .orderBy("col_name")
    )


def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table (all 5 columns are
    integer/string, the profiler's exact-parity domain)."""
    return profile_table(load_table(spark, sf_dir, "documents"))
