"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_and_oracles_aligned():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle without a query"
    # round 4: every registry query has a DuckDB oracle — the one
    # rows-only entry (k-means IVF, data-dependent centroids) was
    # retired to a library function under its recall pytest
    assert set(q) == set(o)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns


def test_every_query_runs_at_smoke_sf(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()  # plans execute


def test_oracle_sql_is_valid_duckdb(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    for name, q in entrymod.oracle_sql().items():
        con.execute(q).fetchall()


def test_round7_rotation_head_is_pinned():
    """The driver consumes ~50 CORRECTNESS rows in dict order, so the
    registry's head section IS the round-7 rotation contract
    (VERDICT r6 #1): 34 tier-0 slots (the new streaming-v4/index/sample/covariance
    /kmv/decay/grid/ANN/delta-join/Z-set/join-size maintenance, CMS join-size
    estimation, watermarked stream dedup,
    SNM, triangle, weighted-sample, top-PC, curriculum, KMV-overlap, PQ/PQ-rerank,
    IVF-PQ/IVF-PQ-rerank, decay-score and grid-density queries + the
    three whose code or oracle changed this round), then
    the 16 r3-latest rows — the exact rotation tail VERDICT r6 listed
    — then the r4 backlog oldest-first. An accidental reorder (e.g. a
    new query inserted at the literal top) would silently displace a
    re-attestation — pin it."""
    keys = list(entrymod.queries().keys())
    assert keys[:50] == [
        "q_stream_curation_v4_maintenance",
        "q_stream_index_maintenance",
        "q_stream_curation_maintenance",
        "q_knn_ivf_det",
        "q_embedding_neardup_lsh",
        "q_doc_snm_pairs",
        "q_token_triangles",
        "q_doc_weighted_sample",
        "q_embedding_top_pc",
        "q_stream_sample_maintenance",
        "q_stream_covariance_maintenance",
        "q_doc_curriculum",
        "q_source_kmv_overlap",
        "q_stream_kmv_maintenance",
        "q_knn_pq",
        "q_knn_pq_rerank",
        "q_events_decay_score",
        "q_stream_decay_maintenance",
        "q_stream_dedup",
        "q_events_grid_clusters",
        "q_stream_grid_maintenance",
        "q_knn_ivfpq",
        "q_knn_ivfpq_rerank",
        "q_stream_ann_maintenance",
        "q_stream_delta_join_maintenance",
        "q_stream_zset_maintenance",
        "q_join_size_estimate",
        "q_stream_join_size_maintenance",
        "q_events_qdigest",
        "q_stream_qdigest_maintenance",
        "q_part_coreness",
        "q_stream_kcore_maintenance",
        "q_events_range_selectivity",
        "q_part_clustering",
        "q_events_anomalous_hours",
        "q_events_time_rollup",
        "q_doc_tfidf_topk",
        "q_doc_domain_cap",
        "q_doc_shards",
        "q_doc_unigram_nll",
        "q_doc_winnow",
        "q_source_contamination",
        "q_doc_winnow_pairs",
        "q_embedding_shard_stats",
        "q_events_latest_state",
        "q_events_rolling_7d",
        "q_events_active_users",
        "q_media_frames",
        "q12_priority_by_returnflag",
        "q_media_features",
    ]
    import json
    import os

    latest = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in (1, 2, 3, 4, 5, 6):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            for q in json.load(open(path)):
                latest[q] = r
    # slots 35-50 burn the entire r3 tail (34 tier-0 slots ahead of
    # them — the late q-digest/coreness pairs, range selectivity and
    # clustering claim 29-34); the driver window is now exactly full:
    # the r4 backlog resumes next round
    assert all(latest.get(k) == 3 for k in keys[34:50])
