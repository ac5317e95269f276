"""Scale-up probe: replicate sf0.1 ~10x into /tmp and measure headline
queries at both sizes.

The bench gate runs at sf0.1; this probe answers the next question —
"does the plan survive 10x?" — by self-unioning the synthetic tables
with remapped keys (key spaces stay disjoint so join/group cardinalities
scale realistically) and comparing wall times. Near-linear scaling means
no single-partition choke points or quadratic joins snuck in.

Replicas are MUTATED, not verbatim clones (VERDICT r4 #2): verbatim
replication made every near-dup probe output-bound — true pair counts
grew ~clones² per original, so jaccard/semantic/LSH/winnow ratios
measured the fixture's quadratic output instead of the plan. Replica i
gets (a) its text passed through an alphabet rotation by i (disjoint
token/shingle/fingerprint sets across replicas, so lexical near-dup
pairs grow exactly linearly — each replica reproduces the base pair
set and nothing crosses), and (b) its embeddings circularly shifted by
i positions (norm-preserving; a shifted near-random vector is
~uncorrelated with every unshifted one, so cross-replica cosines sit
in the background distribution and vector near-dup output also grows
~linearly). Replica 0 stays pristine.

Usage: python tools/scale_probe.py [factor] (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdataminingproject_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/bdmp_scale_probe"

# key columns remapped per replica so cardinalities grow with the data
KEYED = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_top_customers",
    "q_events_sessionize",
    "q_doc_tokens_topk",
    "q_dup_scores",
    "q_ngram_jaccard",
    # the ANN scale path: replicas are shift-mutated, so true pair
    # output grows ~linearly and the ratio measures candidate
    # generation, not fixture output
    "q_embedding_neardup_lsh",
    # round-3 additions: grouping-sets rollup (one scan for all grains),
    # deterministic-cell IVF (equi-join probe), tfidf (two-shuffle +
    # vocab join), DAU/WAU (dedup + bounded range join)
    "q_events_time_rollup",
    "q_knn_ivf_det",
    "q_doc_tfidf_topk",
    "q_events_active_users",
    # round-3 additions, second batch: winnowing (rotation-mutated
    # replicas keep pair output ~linear), unigram LM, source-pair
    # contamination (fanout bounded by #sources)
    "q_doc_winnow",
    "q_doc_winnow_pairs",
    "q_doc_unigram_nll",
    "q_source_contamination",
    # composed curation pipeline (cap -> clone prune -> surprisal band)
    "q_corpus_curation_v2",
    # round-4 additions: map-only signals (blocklist/classifier/chunks
    # should scale ~linearly with zero shuffle growth), PMI (vocab
    # joins + exchange reuse), SemDeDup (within-cell self-join over
    # shift-mutated replicas — drop list grows ~linearly), leakage
    # split
    "q_doc_blocklist",
    "q_doc_quality_classifier",
    "q_doc_chunks",
    "q_doc_pmi_collocations",
    "q_semantic_dedup",
    "q_doc_leakage_split",
    # round-4 additions, second batch: span dedup (window on span hash),
    # SQ8/kmeans/pagerank (iterative + quantized vector paths; kmeans'
    # k x dim update key space is size-invariant), divergence (grid =
    # sources x vocab), cohort retention (co-partitioned user shuffles)
    "q_doc_span_dedup",
    "q_knn_sq8",
    "q_kmeans_clusters",
    "q_token_pagerank",
    "q_source_divergence",
    "q_events_cohort_retention",
    # round-4 third batch: deepest composition, funnel latency,
    # CDC diff, Z-order envelope audit, bounded-leg hard negatives
    "q_corpus_curation_v4",
    "q_events_funnel_latency",
    "q_corpus_diff",
    "q_lineitem_zorder",
    "q_hard_negatives",
    # round-4 later batches: mixture executor, composed Gopher gate,
    # SCD2 (output-bound), truncation audit, probe curve, histogram
    # quantiles (global + per-key)
    "q_doc_apply_mixture",
    "q_doc_gopher_gate",
    "q_events_scd2",
    "q_knn_truncated_recall",
    "q_knn_ivf_probe_curve",
    "q_events_value_quantiles",
    "q_events_latency_by_type",
    # round-4 sixth batch: FK audit (per-edge anti-join counts), doc
    # profiler (one-scan multi-distinct), inverted index (token-key
    # exchange reuse), fuzzy join (linear deletion-variant blocking)
    "q_table_integrity",
    "q_doc_profile",
    "q_doc_inverted_index",
    "q_customer_fuzzy_matches",
    # round-4 seventh batch: skyline (bucketed strict-suffix-max),
    # transition matrix (one user-key window shuffle)
    "q_customer_skyline",
    "q_segment_skyline",
    "q_events_transitions",
    # round-4 eighth batch: Apriori rules (pruned pair join), PIT join
    # (equi-key + interval residual)
    "q_doc_association_rules",
    "q_events_pit_state",
    "q_events_session_paths",
    "q_embedding_covariance",
    # round-5 additions: incremental curation merge (delta-bounded
    # candidate join), 3-D grouped skyline (two-phase local/global SFS)
    "q_corpus_curation_incremental",
    "q_segment_rfm_skyline",
    "q_mmr_rerank",
    "q_events_downsample",
]


ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _mutate(rep, table: str, i: int):
    """Replica-i mutation (no-op for i=0): rotate text alphabets /
    circular-shift embeddings so replicas are near-dup-disjoint."""
    if i == 0:
        return rep
    if table == "documents":
        rot = ALPHA[i % 26 :] + ALPHA[: i % 26]
        rep = rep.withColumn(
            "text",
            F.translate(
                "text", ALPHA + ALPHA.upper(), rot + rot.upper()
            ),
        )
    elif table == "embeddings":
        shift = i % 64
        rep = rep.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", shift + 1, 64 - shift),
                F.slice("embedding", 1, shift),
            ),
        )
    return rep


def build_scaled(spark, factor: int) -> str:
    dst = f"{DST}_{factor}x"
    marker = os.path.join(dst, "_built_v2_mutated")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    from bigdataminingproject_spark.sources.tables import load_table

    for table, keys in KEYED.items():
        # load_table handles the events TIMESTAMP(NANOS) quirk
        df = load_table(spark, SRC, table)
        if keys:
            parts = []
            for i in range(factor):
                rep = _mutate(df, table, i)
                for k in keys:
                    rep = rep.withColumn(
                        k, F.col(k) + F.lit(i * 100_000_000)
                    )
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df  # dims stay fixed (realistic: dims don't scale)
        out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
    open(marker, "w").close()
    return dst


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    out = {}
    for name in PROBE_QUERIES:
        best = None
        for _ in range(2):
            t = time.perf_counter()
            q[name](spark, sf_dir).collect()
            e = time.perf_counter() - t
            best = e if best is None else min(best, e)
        out[name] = round(best, 3)
        spark.sparkContext._jvm.System.gc()
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    scaled_dir = build_scaled(spark, factor)
    base = time_queries(spark, SRC)
    scaled = time_queries(spark, scaled_dir)
    report = {
        "factor": factor,
        "base_sec": base,
        "scaled_sec": scaled,
        "ratio": {
            k: round(scaled[k] / base[k], 2) if base[k] else None
            for k in base
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
