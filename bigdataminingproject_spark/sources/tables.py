"""Parquet table loaders for the driver's synthetic star schema.

Plain ``spark.read.parquet`` — no caching, no eager materialization — so
every downstream query keeps full predicate pushdown / column pruning into
the scan. At cluster scale these would be catalog tables (partitioned,
optionally bucketed on join keys); the API shape is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table (see TESTDATA.md) as a lazy DataFrame."""
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # The driver has shipped events.ts under several parquet
        # encodings across rounds; normalize every one of them to
        # session-TZ (UTC) TimestampType so downstream operators see one
        # type:
        #   * TIMESTAMP(NANOS): rejected by Spark's reader natively —
        #     read the physical INT64 nanos via the legacy conf and
        #     integer-DIV down to micros (nanos exceed 2^53, so float
        #     division would corrupt timestamps; DuckDB/pandas truncate
        #     to micros the same way).
        #   * TIMESTAMP(MICROS, isAdjustedToUTC=false): read as
        #     TIMESTAMP_NTZ — cast to TIMESTAMP; with the session TZ
        #     pinned to UTC (session.py) the cast is value-preserving
        #     and matches the DuckDB naive-UTC oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all synthetic tables keyed by name (lazy; zero jobs triggered)."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
