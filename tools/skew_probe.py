"""Skew-mitigation probe: direct vs guarded paths on a pathologically
skewed fixture (one key/stratum owns 50% of rows), at base and 10x.

The registry queries run on the driver's synthetic testdata, whose key
distributions are uniform — useless for demonstrating the hot-stratum
paths. This probe builds the adversarial distribution the mitigations
exist for (one host = half the corpus / one user = half the log) and
times both paths of ``domain_cap`` and ``latest_by_key`` at two sizes,
so SCALE.md can record whether the guarded path actually flattens the
straggler task as the hot key grows.

Usage: python tools/skew_probe.py [base_rows_docs] [base_rows_events]
(defaults 50_000 docs / 1_000_000 events; 10x of each is also run)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.events import latest_by_key
from bigdataminingproject_spark.operators.sampling import domain_cap
from bigdataminingproject_spark.session import get_spark

DST = "/tmp/bdmp_skew_probe"


def build_docs(spark, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    # even ids -> the hot stratum (50% of rows); odd ids -> 50 cold strata
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 50).cast("string"))
        )
        .alias("source"),
        F.repeat(
            F.lit("x"), ((F.col("id") * 37) % 400 + 1).cast("int")
        ).alias("text"),
    )
    df.write.mode("overwrite").parquet(path)


def build_events(spark, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise((F.col("id") % 10000) + 2)
        .cast("long")
        .alias("user_id"),
        F.concat(F.lit("type"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 13) % 864000
        ).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    df.write.mode("overwrite").parquet(path)


def best_of(fn, runs: int = 3) -> float:
    best = None
    for _ in range(runs):
        t = time.perf_counter()
        fn()
        e = time.perf_counter() - t
        best = e if best is None else min(best, e)
    return round(best, 3)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    report: dict[str, dict] = {}
    for label, n in (("base", n_docs), ("10x", n_docs * 10)):
        path = f"{DST}/docs_{n}"
        build_docs(spark, n, path)
        docs = spark.read.parquet(path)
        direct = best_of(lambda: domain_cap(docs, cap=50).collect())
        guarded = best_of(
            lambda: domain_cap(
                docs, cap=50, hot_threshold=10_000, salt_buckets=32
            ).collect()
        )
        report[f"domain_cap_{label}"] = {
            "rows": n,
            "direct_sec": direct,
            "guarded_sec": guarded,
        }

    for label, n in (("base", n_events), ("10x", n_events * 10)):
        path = f"{DST}/events_{n}"
        build_events(spark, n, path)
        ev = spark.read.parquet(path)
        direct = best_of(lambda: latest_by_key(ev).count())
        guarded = best_of(lambda: latest_by_key(ev, hot_keys=True).count())
        report[f"latest_by_key_{label}"] = {
            "rows": n,
            "direct_sec": direct,
            "guarded_sec": guarded,
        }

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
