"""End-to-end batch-replay detector pipeline (reference entry point A)."""

from __future__ import annotations

import pytest

from bigdataminingproject_spark.plans.pipeline import run_detector_pipeline


@pytest.fixture(scope="module")
def stream(spark):
    rows = []
    pos = 1
    for i in range(95):
        rows.append((pos, "ordinary filler message text"))
        pos += 1
    # 5 exact repeats of the first message → duplicates
    for i in range(5):
        rows.append((pos, "ordinary filler message text"))
        pos += 1
    # a second snapshot period with a bursting token
    for i in range(100):
        body = "calm steady words"
        if i >= 75:
            body += " burstword"
        rows.append((pos, body))
        pos += 1
    return spark.createDataFrame(rows, "stream_pos long, body string")


def test_summary_shape_and_counts(spark, stream):
    summary = run_detector_pipeline(
        stream, update_interval=100, freq_queries=["filler", "BURSTWORD", "zzz"]
    )
    assert summary["processed"] == 200
    # period 1: messages 2..100 are exact repeats of msg 1 → 99 dups.
    # period 2: 'calm steady words' is a single shingle — every repeat
    # after pos 101 scores 1.0 except pos 176 (first 'burstword' shingle
    # halves its score to 0.5) → 98 more. Total 197.
    assert summary["duplicates"]["total"] == 197
    assert summary["duplicates"]["rate"] == pytest.approx(197 / 200)
    assert len(summary["periodic_snapshots"]) == 2
    snap1, snap2 = summary["periodic_snapshots"]
    assert snap1["message_count"] == 100
    assert snap1["duplicates_so_far"] == 99
    assert snap2["message_count"] == 200
    assert snap2["duplicates_so_far"] == 197


def test_burst_in_second_snapshot(spark, stream):
    summary = run_detector_pipeline(stream, update_interval=100)
    snap2 = summary["periodic_snapshots"][1]
    burst_tokens = {b["token"] for b in snap2["burst"]}
    assert "burstword" in burst_tokens
    top = [b for b in snap2["burst"] if b["token"] == "burstword"][0]
    assert top["recent_count"] == 25
    assert top["prev_count"] == 0
    assert top["representative"] == "burstword"


def test_frequency_estimates_lowercased_and_unseen(spark, stream):
    summary = run_detector_pipeline(
        stream, freq_queries=["filler", "BURSTWORD", "zzz"]
    )
    est = summary["frequency_estimates"]
    assert est["filler"] == 100
    assert est["burstword"] == 25  # uppercase query lowercased (A9)
    assert est["zzz"] == 0


def test_exclude_duplicates_mode(spark, stream):
    summary = run_detector_pipeline(stream, exclude_duplicates=True)
    assert summary["excluded_duplicates"] == 197
    # final top tokens computed over the deduplicated stream
    assert summary["final_top_tokens"]["filler"] == 1


def test_final_top_tokens(spark, stream):
    summary = run_detector_pipeline(stream)
    top = summary["final_top_tokens"]
    assert top["calm"] == 100
    assert top["burstword"] == 25
