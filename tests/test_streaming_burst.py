"""DGIM-backed count-window burst parity operator (streaming W2+W3)."""

from __future__ import annotations

from bigdataminingproject_spark.streaming.pipeline import (
    run_to_memory,
    streaming_burst_parity,
)
from bigdataminingproject_spark.streaming.replay import file_replay_source


def test_burst_parity_flags_spike_and_expires_old(spark, tmp_path):
    rows = []
    for i in range(1, 101):
        body = "quiet filler"
        if i <= 25:
            body += " early"  # active only long before the final window
        if i > 75:
            body += " spike"  # dense in the last 25 messages
        rows.append((i, body))
    df = spark.createDataFrame(rows, "stream_pos long, body string")
    stream = file_replay_source(
        spark,
        df,
        str(tmp_path / "burststage"),
        chunks=4,
        files_per_trigger=1,
        order_col="stream_pos",
    )
    out = streaming_burst_parity(stream, window=50)
    run_to_memory(out, "burst_parity", output_mode="append")
    rows = spark.table("burst_parity").collect()
    # final trigger's boundary is position 100
    final = {r["token"]: r for r in rows if r["boundary"] == 100}
    assert "spike" in final
    spike = final["spike"]
    # DGIM estimates: recent ≈ 25, prev ≈ 0 within the ≤50% bucket bound
    assert spike["recent_count"] >= 13
    assert spike["ratio"] > 2.0
    # 'early' fell out of the 50-message window entirely → recent 0 →
    # filtered by min_count (DGIM expiry across batches)
    assert "early" not in final


def test_burst_parity_state_spans_batches(spark, tmp_path):
    # spike is concentrated in positions 26-40 (recent window of the
    # final boundary) but absent from the final batch (41-50) → its
    # counts can only come from DGIM state carried across micro-batches
    rows = [(i, "base spike" if 26 <= i <= 40 else "base") for i in range(1, 51)]
    df = spark.createDataFrame(rows, "stream_pos long, body string")
    stream = file_replay_source(
        spark,
        df,
        str(tmp_path / "burststage2"),
        chunks=5,
        files_per_trigger=1,
        order_col="stream_pos",
    )
    out = streaming_burst_parity(stream, window=50, threshold=2.0)
    run_to_memory(out, "burst_parity2", output_mode="append")
    rows = spark.table("burst_parity2").collect()
    final = {r["token"]: r for r in rows if r["boundary"] == 50}
    assert "spike" in final  # state carried across micro-batches
    # 15 true occurrences in (25, 50]; none in (0, 25] → huge ratio
    assert final["spike"]["recent_count"] >= 8
    assert final["spike"]["ratio"] > 1000
