"""Streaming PageRank maintenance twin: the LSM-folded co-occurrence
graph must land the batch power iteration on bit-identical doubles.

Twin of operators/frequency.py::token_pagerank (no reference
counterpart — the reference has no graph surface).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.frequency import (
    bigram_count_partial,
    fold_bigram_counts,
    pagerank_from_bigram_counts,
    q_token_pagerank,
)
from bigdataminingproject_spark.sources.tables import load_table


def test_fold_closure_rebuilds_exact_graph(spark, sf_dir):
    """Bigram partials folded from arbitrary disjoint doc splits must
    equal the single-pass graph exactly (counts close under +)."""
    docs = load_table(spark, sf_dir, "documents")
    parts = [
        bigram_count_partial(docs.filter(F.col("doc_id") % 3 == i))
        for i in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    folded = {
        r["bigram"]: r["c"] for r in fold_bigram_counts(stacked).collect()
    }
    want = {r["bigram"]: r["c"] for r in bigram_count_partial(docs).collect()}
    assert folded == want


def test_publish_from_folded_graph_equals_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    parts = [
        bigram_count_partial(docs.filter(F.col("doc_id") % 2 == i))
        for i in range(2)
    ]
    folded = fold_bigram_counts(parts[0].unionByName(parts[1]))
    got = [
        tuple(r)
        for r in pagerank_from_bigram_counts(
            folded, damping=0.85, iters=3, top_n=20
        ).collect()
    ]
    want = [tuple(r) for r in q_token_pagerank(spark, sf_dir).collect()]
    assert got == want


def test_stream_twin_equals_batch(spark, sf_dir):
    from bigdataminingproject_spark.streaming.pipeline import (
        q_stream_pagerank_maintenance,
    )

    got = [
        tuple(r)
        for r in q_stream_pagerank_maintenance(spark, sf_dir).collect()
    ]
    want = [tuple(r) for r in q_token_pagerank(spark, sf_dir).collect()]
    assert got == want


def test_retention_fold_closure_and_twin(spark, sf_dir):
    """Presence pairs are a set: distinct-union of arbitrary disjoint
    event splits rebuilds the exact relation, and the streaming twin
    lands on the batch triangle."""
    from bigdataminingproject_spark.operators.events import (
        cohort_triangle_from_uw,
        fold_user_weeks,
        q_events_cohort_retention,
        user_week_partial,
    )
    from bigdataminingproject_spark.streaming.pipeline import (
        q_stream_retention_maintenance,
    )

    ev = load_table(spark, sf_dir, "events")
    parts = [
        user_week_partial(ev.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    folded = fold_user_weeks(
        parts[0].unionByName(parts[1]).unionByName(parts[2])
    )
    want_batch = [
        tuple(r) for r in q_events_cohort_retention(spark, sf_dir).collect()
    ]
    assert [
        tuple(r) for r in cohort_triangle_from_uw(folded).collect()
    ] == want_batch
    got = [
        tuple(r)
        for r in q_stream_retention_maintenance(spark, sf_dir).collect()
    ]
    assert got == want_batch
