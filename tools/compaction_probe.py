"""16-batch streaming-curation probe: per-batch wall time with LSM
compaction ON vs OFF (VERDICT r6 #3).

Replays the incremental curation maintenance
(q_stream_curation_maintenance's flow) with 16 delta chunks instead of
4 and times every ``foreachBatch`` upsert. With compaction OFF the
store accumulates one part per batch — read-side file listing and
parquet-open overhead grow linearly, so per-batch wall time trends up.
With the binary-counter compaction ON the live part count stays
O(log B) and the trend flattens (bounded spikes at counter-carry
batches are the amortized merges).

Also verifies correctness under compaction: the final kept set must
equal the full-corpus batch rerun (same check the oracle gate does).

Usage: python tools/compaction_probe.py [sf_dir ...]
Defaults to sf0.1 and the 10x probe dir when present. One JSON line per
(dir, mode).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdataminingproject_spark.session import get_spark

CHUNKS = 16


def probe(spark, sf_dir: str, compact: bool) -> dict:
    from bigdataminingproject_spark.operators.dedup import shingle_relation
    from bigdataminingproject_spark.plans.curation import (
        _split_cutoff,
        curate_delta_state,
        curation_state,
        materialized_shingles_dir,
        materialized_state_dir,
    )
    from bigdataminingproject_spark.sources.tables import load_table
    from bigdataminingproject_spark.streaming.replay import (
        file_replay_source,
    )
    from bigdataminingproject_spark.streaming.statestore import (
        AppendOnlyPartsStore,
    )

    docs = load_table(spark, sf_dir, "documents")
    cutoff = _split_cutoff(docs)
    snap = docs.filter(F.col("doc_id") <= cutoff)
    delta = docs.filter(F.col("doc_id") > cutoff).select("doc_id", "text")
    day0_dir = materialized_state_dir(spark, sf_dir, snap, cutoff)
    day0_sh = materialized_shingles_dir(spark, day0_dir)
    staging = tempfile.mkdtemp(prefix="compaction_probe_src_")
    state_root = tempfile.mkdtemp(prefix="compaction_probe_state_")
    # fanout 2 = compaction on; a fanout above the batch count means no
    # merge ever fires (pure append-only, the pre-round-7 behavior)
    fanout = 2 if compact else CHUNKS + 2
    manifest = AppendOnlyPartsStore(
        spark, state_root, "manifest", merge_fanout=fanout
    )
    manifest.attach_protected(day0_dir)
    shingles = AppendOnlyPartsStore(
        spark, state_root, "shingles", merge_fanout=fanout
    )
    shingles.attach_protected(day0_sh)
    batch_secs: list[float] = []

    def upsert(batch_df, batch_id):
        t0 = time.perf_counter()
        delta_state = curate_delta_state(
            manifest.read(), batch_df, state_shingles=shingles.read()
        )
        manifest.append(
            delta_state,
            derive=lambda part: shingles.append(shingle_relation(part)),
        )
        batch_secs.append(round(time.perf_counter() - t0, 3))

    try:
        stream = file_replay_source(
            spark, delta, staging, chunks=CHUNKS, order_col="doc_id"
        )
        from bigdataminingproject_spark.streaming.pipeline import (
            snapshot_sink,
        )

        snapshot_sink(stream, upsert)
        final_kept = sorted(
            r.doc_id
            for r in manifest.read()
            .filter(F.col("dropped_neardup") == 0)
            .select("doc_id")
            .collect()
        )
        expected_kept = sorted(
            r.doc_id
            for r in curation_state(docs)
            .filter(F.col("dropped_neardup") == 0)
            .select("doc_id")
            .collect()
        )
        assert final_kept == expected_kept, (
            f"incremental kept set diverged: {len(final_kept)} vs "
            f"{len(expected_kept)} rows"
        )
        half = CHUNKS // 2
        return {
            "dir": sf_dir,
            "compaction": compact,
            "chunks": CHUNKS,
            "batch_secs": batch_secs,
            "first_half_mean": round(sum(batch_secs[:half]) / half, 3),
            "second_half_mean": round(sum(batch_secs[half:]) / half, 3),
            "final_parts": manifest.n_parts + shingles.n_parts,
            "merges": manifest.merges + shingles.merges,
            "rows_rewritten": manifest.rows_rewritten
            + shingles.rows_rewritten,
            "kept_rows": len(final_kept),
            "correct": True,
        }
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or [
        d
        for d in ("/root/testdata/sf0.1", "/tmp/bdmp_scale_probe_10x")
        if os.path.isdir(d)
    ]
    spark = get_spark("compaction-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        for compact in (False, True):
            print(json.dumps(probe(spark, d, compact)), flush=True)


if __name__ == "__main__":
    main()
