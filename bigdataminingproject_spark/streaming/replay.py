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

    ``files_per_trigger`` > 1 splits every chunk into that many staged
    files (one micro-batch still consumes one CHUNK — maxFilesPerTrigger
    files in mtime order = one contiguous order_col range). This is the
    parallelism knob: a single-file chunk is read as ONE input partition,
    so every per-batch transform downstream runs on one core no matter
    how many executors exist (measured 17x on the 100x replica — the
    round-7 KMV twin pathology). Multi-file chunks give each micro-batch
    ``files_per_trigger``-way scan parallelism while replay order and
    batch boundaries stay identical.
    """
    import os
    import time

    total_files = max(1, chunks) * max(1, files_per_trigger)
    if order_col is not None:
        # No full count here: it re-evaluates the whole input relation
        # (expensive when the caller stages a derived stream, e.g. the
        # KMV twin's exploded+hashed shingle relation) and the ordered
        # path doesn't need the chunk cap — ranges beyond the data are
        # simply empty and produce fewer staged files. Only the
        # zero-row edge needs a cheap existence probe.
        if df.isEmpty():
            df = df.coalesce(1)
        else:
            df = df.repartitionByRange(
                total_files, order_col
            ).sortWithinPartitions(order_col)
    else:
        n = df.count()
        chunks = max(1, min(chunks, n))
        total_files = chunks * max(1, files_per_trigger)
        per_chunk = max(1, math.ceil(n / total_files))
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
