"""Replay sources: turn a bounded table into a Structured Streaming input.

The reference replays its corpus through a Python generator
(run_detectors.py:14-34). The Spark-native equivalent is a file source
with ``maxFilesPerTrigger`` — deterministic, checkpointable, and the same
code path a production Kafka/file stream would take.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def file_replay_source(
    spark: SparkSession,
    df: DataFrame,
    staging_dir: str,
    chunks: int = 10,
    files_per_trigger: int = 1,
    order_col: str | None = None,
) -> DataFrame:
    """Materialize ``df`` into ``chunks`` parquet files and re-read them as
    a rate-limited stream (micro-batch per ``files_per_trigger`` files).

    With ``order_col``, chunks are range-partitioned on it and their file
    modification times staggered so the file source replays them in
    stream order (the reference's sorted generator, S4). Without it,
    arrival order is undefined — downstream operators must rely on
    event-time columns (the Spark model).
    """
    import os
    import time

    n = df.count()
    chunks = max(1, min(chunks, n))
    if order_col is not None:
        df = df.repartitionByRange(chunks, order_col).sortWithinPartitions(
            order_col
        )
    else:
        per_chunk = max(1, math.ceil(n / chunks))
        df = df.repartition(max(1, math.ceil(n / per_chunk)))
    df.write.mode("overwrite").parquet(staging_dir)
    if order_col is not None:
        # FileStreamSource batches files by modification time; stagger
        # mtimes along the range-partition (= name) order.
        parts = sorted(
            f
            for f in os.listdir(staging_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        base = time.time() - len(parts) * 10
        for i, name in enumerate(parts):
            path = os.path.join(staging_dir, name)
            os.utime(path, (base + i * 10, base + i * 10))
    schema = spark.read.parquet(staging_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .option("latestFirst", "false")
        .parquet(staging_dir)
    )
