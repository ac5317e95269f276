"""Snapshot/burst count-window semantics (reference W3/W5,
burst_detector.py:43-77, run_detectors.py:193-211) on crafted streams."""

from __future__ import annotations

import pytest

from bigdataminingproject_spark.operators.snapshots import (
    burst_windows,
    snapshot_summary,
    topk_cumulative_tokens,
)


@pytest.fixture(scope="module")
def stream(spark):
    # 100 docs: 'quiet' appears everywhere; 'spike' only in positions 76-100
    # (the last 25 of the first snapshot window).
    rows = []
    for i in range(100):
        text = "quiet filler words"
        if i >= 75:
            text += " spike"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_burst_flags_spiking_token(spark, stream):
    out = burst_windows(stream).collect()
    by_token = {r["token"]: r for r in out}
    assert "spike" in by_token
    r = by_token["spike"]
    assert r["boundary"] == 100
    assert r["recent_count"] == 25
    assert r["prev_count"] == 0
    # (25 + 1e-6) / (0 + 1e-6) is astronomically over threshold
    assert r["ratio"] > 2.0


def test_burst_ignores_uniform_token(spark, stream):
    out = burst_windows(stream).collect()
    tokens = {r["token"] for r in out}
    # 'quiet' is 25 recent vs 25 prev → ratio 1.0 → not flagged
    assert "quiet" not in tokens


def test_snapshot_summary_counts(spark, stream):
    out = snapshot_summary(stream).collect()
    assert len(out) == 1  # exactly one 100-doc bucket
    snap = out[0]
    assert snap["snapshot_id"] == 0
    assert snap["message_count"] == 100
    assert snap["duplicates_so_far"] > 0  # repeated filler text is near-dup
    assert snap["distinct_tokens_in_period"] == 4  # quiet filler words spike


def test_topk_cumulative_ranks(spark, stream):
    out = topk_cumulative_tokens(stream, k=2).collect()
    first = [r for r in out if r["snapshot_id"] == 0]
    assert [r["rnk"] for r in first] == [1, 2]
    # all of quiet/filler/words have count 100 — ties break lexicographically
    assert first[0]["token"] == "filler"
    assert first[0]["cum_count"] == 100


def test_partial_final_bucket(spark):
    rows = [(i, "alpha beta") for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = snapshot_summary(df).collect()
    assert [r["snapshot_id"] for r in out] == [0, 1]
    assert out[1]["message_count"] == 150  # final flush covers remainder
