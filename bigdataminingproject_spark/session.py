"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config here is chosen for cluster scale: AQE for runtime re-planning and
skew-join splitting, Arrow for the few vectorized-UDF paths, a broadcast
threshold large enough that TPC-H-style dimension tables never shuffle.

Runtime-settable confs are also applied to *existing* sessions via
``tune_session`` so driver-supplied sessions (``__spark_entry__.entry``)
get the same behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that can be changed on a live session (spark.conf.set).
_RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/customer/supplier/part at test SFs) are
    # broadcast; at 100 TB only genuinely small sides stay under this.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics: match the DuckDB oracle (naive UTC).
    "spark.sql.session.timeZone": "UTC",
    # InferFiltersFromGenerate synthesizes `size(gen) > 0 AND
    # isnotnull(gen)` before every explode; filter pushdown then inlines
    # the full generator expression (our interpreted higher-order
    # shingle pipelines) below the materializing projections, evaluating
    # it 2x per row in interpreted mode. Semantics-neutral to exclude —
    # non-outer Generate already drops empty arrays — and measured
    # -35%/-24% on the winnowing / dup-score operators at sf0.1.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # Local default; AQE coalesces down. On a real cluster this would be
    # sized ~2-3x total cores or set via spark.sql.adaptive.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be fixed by the host; never fail on tuning.
            pass
    return spark


def get_spark(app_name: str = "bigdataminingproject-spark") -> SparkSession:
    """Create (or fetch) the engine SparkSession.

    ``local[N]`` with N from $SPARK_GRAFT_CPUS (default 32). All engine
    queries are declarative, so the same code runs unchanged on a
    multi-executor cluster — only the master URL differs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # local-mode memory headroom; ignored if a JVM already exists.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", "/tmp/bdmp_spark_warehouse")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune_session(spark)


def shuffle_partitions(spark: SparkSession, default: int = 32) -> int:
    """``spark.sql.shuffle.partitions`` as an int, degrading to
    ``default`` when the conf is non-numeric (e.g. "auto" under
    Databricks AQE) — operators that derive bucket counts from it must
    never raise on exotic deployments (ADVICE r4)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", str(default)))
    except (TypeError, ValueError):
        return default
