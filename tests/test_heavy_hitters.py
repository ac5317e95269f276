"""Exact two-pass heavy hitters (Misra-Gries candidates + exact
recount) and its streaming count-folding maintenance twin.

No reference counterpart (north-star frequency family beyond the
reference's CMS+heap top-k, frequency_detector.py parity notes) — the
point here is the 100 TB shape: candidate discovery shuffles at most
partitions x (s+1) rows instead of the corpus vocabulary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.frequency import (
    HH_S,
    finish_heavy_hitters,
    fold_token_counts,
    heavy_hitters,
    mg_candidate_partials,
    q_doc_heavy_hitters,
    token_count_partial,
    token_counts,
)
from bigdataminingproject_spark.functions.text import (
    remove_stopwords,
    tokenize,
)
from bigdataminingproject_spark.sources.tables import load_table


def _naive_hh(docs, s):
    """Reference implementation: full exact counts, then the same
    integer ceil-div threshold."""
    counts = token_counts(docs)
    n = counts.agg(F.sum("token_count").alias("n"))
    return (
        counts.join(F.broadcast(n))
        .filter(F.col("token_count") >= F.expr(f"(n + {s - 1}) div {s}"))
        .select("token", "token_count")
        .orderBy(F.desc("token_count"), "token")
    )


def test_two_pass_matches_naive_exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = heavy_hitters(docs, s=HH_S).collect()
    want = _naive_hh(docs, HH_S).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0  # sf0.001 has tokens above N/HH_S


def test_partitioning_independence(spark, sf_dir):
    """The published set may not depend on how rows land in
    partitions — the determinism claim the oracle relies on."""
    docs = load_table(spark, sf_dir, "documents")
    base = [tuple(r) for r in heavy_hitters(docs, s=HH_S).collect()]
    assert base  # non-trivial comparison
    for parts in (1, 7):
        shuffled = docs.repartition(parts)
        got = [tuple(r) for r in heavy_hitters(shuffled, s=HH_S).collect()]
        assert got == base


def test_mg_candidates_are_a_superset_and_bounded(spark, sf_dir):
    """Pass-1 summaries must (a) retain every true heavy hitter under
    aggressive pruning (s small enough that pruning certainly fires),
    (b) emit at most s+1 rows per partition, and (c) carry the exact
    global N in the marker rows."""
    docs = load_table(spark, sf_dir, "documents").repartition(5)
    s = HH_S
    toks = docs.select(
        F.explode(remove_stopwords(tokenize(F.col("text")))).alias("token")
    )
    partials = mg_candidate_partials(toks, s)
    rows = partials.collect()
    markers = [r for r in rows if r["token"] is None]
    kept = [r for r in rows if r["token"] is not None]
    # (c) exact N from the same scan
    assert sum(r["cnt"] for r in markers) == toks.count()
    # (b) bounded summaries: <= s kept rows per partition means
    # <= s * partitions overall (markers are 1/partition)
    assert len(kept) <= s * len(markers)
    # (a) superset of the true hitters at threshold ceil(N/s)
    true_hh = {r["token"] for r in _naive_hh(docs, s).collect()}
    assert true_hh  # N/HH_S is crossed on sf0.001 (pinned by the
    # matches-naive test above)
    assert true_hh <= {r["token"] for r in kept}


def test_mg_pruning_retains_hitters_on_skewed_stream(spark):
    """The sf0.001 corpus vocabulary (~29 tokens) never overflows an
    s=256 summary, so pruning is exercised here on a skewed synthetic
    relation whose vocabulary (502 tokens) >> s=8: the summaries must
    shed the tail yet retain every token above N/s, and the full
    two-pass answer must equal the naive plan's."""
    rows = (
        [("hot",)] * 3000
        + [("warm",)] * 1500
        # alphabetic suffixes: the tokenizer splits on non-letter runs,
        # so digit suffixes would collapse every tail into one token
        + [
            (f"tail{chr(97 + i // 26)}{chr(97 + i % 26)}",)
            for i in range(500)
            for _ in range(11)
        ]
    )
    toks = spark.createDataFrame(rows, "token string").repartition(5)
    s = 8
    partials = mg_candidate_partials(toks, s)
    prows = partials.collect()
    markers = [r for r in prows if r["token"] is None]
    kept = [r for r in prows if r["token"] is not None]
    assert sum(r["cnt"] for r in markers) == 10000
    assert len(kept) <= s * len(markers)  # pruning fired: 502 >> 40
    assert {"hot", "warm"} <= {r["token"] for r in kept}
    # end-to-end: exact counts and only the true hitters published
    docs = toks.select(F.lit("d").alias("doc_id"), F.col("token").alias("text"))
    got = {(r["token"], r["token_count"]) for r in heavy_hitters(docs, s=s).collect()}
    assert got == {("hot", 3000), ("warm", 1500)}


def test_threshold_boundary_integer_exact(spark):
    """ceil-div boundary: with s=4 and N=10 the threshold is 3 —
    a count-3 token is published, a count-2 token is not."""
    docs = spark.createDataFrame(
        [("d1", "alpha alpha alpha beta beta gamma delta epsilon zeta eta")],
        "doc_id string, text string",
    )
    got = {(r["token"], r["token_count"]) for r in heavy_hitters(docs, s=4).collect()}
    assert got == {("alpha", 3)}


def test_fold_closure_under_any_split(spark, sf_dir):
    """Count partials folded from arbitrary disjoint doc splits must
    land exactly on the batch answer — the LSM merge contract."""
    docs = load_table(spark, sf_dir, "documents")
    a = token_count_partial(docs.filter(F.col("doc_id") % 3 == 0))
    b = token_count_partial(docs.filter(F.col("doc_id") % 3 == 1))
    c = token_count_partial(docs.filter(F.col("doc_id") % 3 == 2))
    folded = fold_token_counts(a.unionByName(b).unionByName(c))
    got = [tuple(r) for r in finish_heavy_hitters(folded).collect()]
    want = [tuple(r) for r in q_doc_heavy_hitters(spark, sf_dir).collect()]
    assert got == want


def _naive_grouped_hh(docs, key_col, s):
    """Reference: full per-key exact counts + per-key threshold."""
    toks = docs.select(
        F.col(key_col).alias("k"),
        F.explode(remove_stopwords(tokenize(F.col("text")))).alias("token"),
    ).filter(F.col("k").isNotNull())
    counts = toks.groupBy("k", "token").agg(
        F.count(F.lit(1)).alias("token_count")
    )
    n = counts.groupBy("k").agg(F.sum("token_count").alias("n"))
    return (
        counts.join(n, "k")
        .filter(F.col("token_count") >= F.expr(f"(n + {s - 1}) div {s}"))
        .select(F.col("k").alias(key_col), "token", "token_count")
        .orderBy(key_col, F.desc("token_count"), "token")
    )


def test_grouped_two_pass_matches_naive(spark, sf_dir):
    from bigdataminingproject_spark.operators.frequency import (
        grouped_heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = [
        tuple(r) for r in grouped_heavy_hitters(docs, "source", s=HH_S).collect()
    ]
    want = [
        tuple(r) for r in _naive_grouped_hh(docs, "source", HH_S).collect()
    ]
    assert got == want
    assert len(got) > 0
    assert len({k for k, _, _ in got}) > 1  # several keys publish


def test_grouped_mg_prunes_per_key_and_retains_hitters(spark):
    """Skewed per-key streams: each key's summary sheds its own tail
    yet retains that key's hitters — state is keys x s, and one key's
    flood cannot evict another key's counters."""
    from bigdataminingproject_spark.operators.frequency import (
        grouped_heavy_hitters,
        mg_candidate_partials_by_key,
    )

    rows = []
    for key, hot, n_hot in (("a", "aaahot", 2000), ("b", "bbbhot", 900)):
        rows += [(key, hot)] * n_hot
        rows += [
            (key, f"{key}tail{chr(97 + i // 26)}{chr(97 + i % 26)}")
            for i in range(300)
            for _ in range(3)
        ]
    toks = spark.createDataFrame(rows, "k string, token string").repartition(5)
    s = 8
    prows = mg_candidate_partials_by_key(toks, s).collect()
    markers = {(r["k"]): 0 for r in prows if r["token"] is None}
    for r in prows:
        if r["token"] is None:
            markers[r["k"]] += r["cnt"]
    assert markers == {"a": 2900, "b": 1800}
    kept = {(r["k"], r["token"]) for r in prows if r["token"] is not None}
    assert ("a", "aaahot") in kept and ("b", "bbbhot") in kept
    docs = toks.select(
        F.col("k").alias("source"), F.col("token").alias("text")
    )
    got = {
        (r["source"], r["token"], r["token_count"])
        for r in grouped_heavy_hitters(docs, "source", s=s).collect()
    }
    assert got == {("a", "aaahot", 2000), ("b", "bbbhot", 900)}


def test_stream_twin_equals_batch(spark, sf_dir):
    from bigdataminingproject_spark.streaming.pipeline import (
        q_stream_hh_maintenance,
    )

    got = [
        tuple(r) for r in q_stream_hh_maintenance(spark, sf_dir).collect()
    ]
    want = [tuple(r) for r in q_doc_heavy_hitters(spark, sf_dir).collect()]
    assert got == want
