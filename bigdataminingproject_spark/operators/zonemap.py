"""Zone-map (data-skipping) effectiveness statistics.

Every lake-house scan at 100 TB lives or dies on PRUNING: per-file
min/max "zone maps" (Netezza zone maps; Parquet row-group stats;
Delta/Iceberg file stats) let the planner skip whole chunks whose
value range cannot intersect the predicate. How much actually gets
skipped is a property of the LAYOUT — a column clustered into the
chunk key prunes almost perfectly, an uncorrelated one barely at all.
This operator measures that, next to ground truth, for two layouts of
the same table:

  * ``natural``  — chunks are key ranges of the write order
    (l_orderkey DIV chunk span): whatever correlation the ingest
    order happens to have;
  * ``clustered`` — chunks are value ranges of the predicate column
    itself (ship month): the layout a Z-order / partition-by-date
    rewrite produces (the effectiveness half of q_lineitem_zorder's
    layout half).

For each layout: chunk count, chunks surviving the zone test
(chunk min/max intersects the predicate), rows scanned (sum of
surviving chunks' rows) vs rows actually matching, and the 6-dp scan
fraction. Everything is ONE hash-agg per layout over metadata-sized
chunk relations (chunks = key-range groups, never a global sort or
row_number), then a 2-row report — exact integer counts, one pinned
ratio.

No reference counterpart (the reference has no storage-layout
surface); optimizer-statistics family member beside the equi-depth
histogram, q-digest ranges, and CMS join estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.sources.tables import load_table

ZONE_ORDER_SPAN = 64  # orders per natural chunk
# predicate: ship year 1996 (one full year, engine-identical bounds)
ZONE_PRED_LO = "1996-01-01"
ZONE_PRED_HI = "1996-12-31 23:59:59"


def zone_report(
    df: DataFrame,
    chunk_col,
    layout: str,
    lo: str = ZONE_PRED_LO,
    hi: str = ZONE_PRED_HI,
) -> DataFrame:
    """One report row for one layout: build the (chunk, min, max,
    rows) zone relation with a single hash-agg keyed by ``chunk_col``,
    apply the zone test, and fold to totals."""
    zones = df.groupBy(chunk_col.alias("chunk")).agg(
        F.min("l_shipdate").alias("zlo"),
        F.max("l_shipdate").alias("zhi"),
        F.count(F.lit(1)).alias("rows"),
    )
    plo, phi = F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")
    survives = (F.col("zhi") >= plo) & (F.col("zlo") <= phi)
    matched = df.filter(
        (F.col("l_shipdate") >= plo) & (F.col("l_shipdate") <= phi)
    ).count()
    return zones.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(survives, 1).otherwise(0))
        .cast("bigint")
        .alias("n_scanned_chunks"),
        F.sum("rows").cast("bigint").alias("rows_total"),
        F.sum(F.when(survives, F.col("rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.lit(int(matched)).cast("bigint").alias("rows_matched"),
        F.round(
            F.sum(F.when(survives, F.col("rows")).otherwise(0)).cast(
                "double"
            )
            / F.sum("rows").cast("double"),
            6,
        ).alias("scan_fraction"),
    )


def q_lineitem_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning effectiveness for a one-year ship-date
    predicate under the natural (orderkey-range) layout vs the
    date-clustered layout — the measured argument for clustering."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    natural = zone_report(
        li,
        # integer DIV: matches DuckDB // on the non-negative keys
        F.expr(f"l_orderkey DIV {ZONE_ORDER_SPAN}"),
        "natural",
    )
    clustered = zone_report(
        li,
        (
            F.year("l_shipdate") * F.lit(12)
            + (F.month("l_shipdate") - F.lit(1))
        ).cast("bigint"),
        "clustered",
    )
    return natural.unionByName(clustered).orderBy("layout")


def zonemap_oracle_sql(
    span: int = ZONE_ORDER_SPAN,
    lo: str = ZONE_PRED_LO,
    hi: str = ZONE_PRED_HI,
) -> str:
    """DuckDB mirror of ``q_lineitem_zonemap`` — identical chunk
    keys, zone test, and the pinned scan-fraction quotient."""
    return f"""
WITH li AS (
    SELECT l_orderkey, l_shipdate FROM lineitem
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS matched FROM li
    WHERE l_shipdate >= TIMESTAMP '{lo}'
      AND l_shipdate <= TIMESTAMP '{hi}'
),
rep AS (
    SELECT 'natural' AS layout, l_orderkey // {span} AS chunk,
           min(l_shipdate) AS zlo, max(l_shipdate) AS zhi,
           count(*) AS rows
    FROM li GROUP BY 1, 2
    UNION ALL
    SELECT 'clustered',
           year(l_shipdate) * 12 + (month(l_shipdate) - 1),
           min(l_shipdate), max(l_shipdate), count(*)
    FROM li GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN zhi >= TIMESTAMP '{lo}'
                      AND zlo <= TIMESTAMP '{hi}'
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS n_scanned_chunks,
       CAST(sum(rows) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN zhi >= TIMESTAMP '{lo}'
                      AND zlo <= TIMESTAMP '{hi}'
                     THEN rows ELSE 0 END) AS BIGINT)
           AS rows_scanned,
       (SELECT matched FROM m) AS rows_matched,
       round(CAST(sum(CASE WHEN zhi >= TIMESTAMP '{lo}'
                            AND zlo <= TIMESTAMP '{hi}'
                           THEN rows ELSE 0 END) AS DOUBLE)
             / CAST(sum(rows) AS DOUBLE), 6) AS scan_fraction
FROM rep
GROUP BY layout
ORDER BY layout"""
