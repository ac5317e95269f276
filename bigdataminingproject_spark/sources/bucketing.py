"""Bucketed-table support: shuffle-free co-located joins.

At 100 TB the fact-fact join (e.g. lineitem ⋈ orders on orderkey) is the
dominant shuffle. Writing both tables bucketed (+ sorted) on the join key
pins co-partitioning into the storage layout: Spark's bucketed scan
satisfies the join's distribution requirement, so SortMergeJoin runs with
NO exchange on either side — the shuffle is paid once at write time and
amortized over every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets SortMergeJoin skip its sort as well —
    the join becomes a pure streaming merge of co-located files.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket column.

    With matching bucket counts this plans as an exchange-free
    SortMergeJoin (verify with plans/explain.shuffle_exchange_count == 0).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
