"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (sf0.1).

Prints exactly ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count of the result) — results are
small aggregates/top-ks, so timing is dominated by the distributed work,
not driver collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataminingproject_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_top_customers",
    "q_customer_order_rank",
    "q_events_hourly",
    "q_events_burst",
    "q_events_sessionize",
    "q_events_attribution",
    "q_events_time_rollup",
    "q_events_funnel",
    "q_doc_tokens_topk",
    "q_dup_scores",
    "q_ngram_jaccard",
    "q_knn_bruteforce",
    "q_embedding_neardup_lsh",
    # round-2 additions: heaviest extended-TPC-H shapes + quality family
    "q9_profit_by_nation",
    "q18_large_orders",
    "q_doc_repetition",
    # round-3 additions: deterministic-cell IVF, tfidf vocabulary join,
    # winnowing window pipeline
    "q_knn_ivf_det",
    "q_doc_tfidf_topk",
    "q_doc_winnow",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # JVM/codegen + Python-worker-pool warmup so the first timed query
    # isn't charged for session startup (steady-state throughput is what
    # BASELINE compares).
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop(batches):
        yield from batches

    spark.range(1000).selectExpr("id", "CAST(id AS double) d").mapInPandas(
        _noop, "id long, d double"
    ).count()
    # Per-query codegen/JIT warmup at the smallest SF: the generated
    # whole-stage code depends only on the plan shape, not the data dir,
    # so one cheap sf0.001 execution compiles (and C2-JITs) the same
    # classes the timed sf0.1 runs will hit. Without this, even the
    # second timed run of codegen-heavy queries (regex tokenize +
    # shingle pipelines) still pays multi-second JIT tails.
    warm_dir = "/root/testdata/sf0.001"
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        try:
            fn(spark, warm_dir).collect()
        except Exception:
            pass  # warmup is best-effort; timing below still runs
        best, rows = None, 0
        # Steady-state timing: best of 3 runs — the first execution of a
        # plan shape pays one-time whole-stage-codegen JIT compilation,
        # which a long-running deployment amortizes to zero, and later
        # queries in the 22-query sequence inherit JVM heap/codegen-cache
        # pressure that a third run rides out (measured: jaccard 2.1s
        # minimal-context vs 4-8s after 15 queries with only 2 runs). A
        # JVM GC between queries keeps one query's garbage off the next's
        # clock.
        for _ in range(3):
            start = time.perf_counter()
            # Materialize fully: small results → collect is fair and
            # forces every stage, incl. final sort/limit.
            rows = len(fn(spark, sf_dir).collect())
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({rows} rows)", file=sys.stderr)
        spark.sparkContext._jvm.System.gc()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": 3,
                "aggregation": "min",
            }
        )
    )


if __name__ == "__main__":
    main()
