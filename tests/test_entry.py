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


def test_round6_rotation_head_is_pinned():
    """The driver consumes ~50 CORRECTNESS rows in dict order, so the
    registry's head section IS the round-6 rotation contract
    (VERDICT r5 #1): 8 tier-0 (2 new round-6 queries + 6 whose code or
    oracle changed), then the 2 never-driver-attested round-5 queries,
    then the 5 r2-deferred map-only transforms, then the oldest (r3)
    backlog. An accidental reorder (e.g. a new query inserted at the
    literal top) would silently displace a re-attestation — pin it.
    (Second round-6 batch added 3 more tier-0 rows: BPE train/segment
    and the stream-stream join; 3 more r3 rows roll to round 7.)"""
    keys = list(entrymod.queries().keys())
    assert keys[:18] == [
        "q_stream_curation_maintenance",
        "q_sql_region_revenue",
        "q_doc_bpe_train",
        "q_doc_bpe_segment",
        "q_stream_join_attribution",
        "q_events_downsample",
        "q_embedding_neardup_lsh",
        "q_semantic_dedup",
        "q_corpus_curation_v4",
        "q_corpus_curation_incremental",
        "q_stream_hourly_maintenance",
        "q_segment_rfm_skyline",
        "q_mmr_rerank",
        "q_doc_pack_sequences",
        "q_doc_repetition",
        "q_doc_pii_redact",
        "q_doc_decontaminate",
        "q_doc_length_buckets",
    ]
    import json
    import os

    latest = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in (1, 2, 3, 4, 5):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            for q in json.load(open(path)):
                latest[q] = r
    # slots 19-50 burn the oldest backlog: every one is an r3 row
    stale = [k for k in keys[18:50] if latest.get(k, 9) == 3]
    assert len(stale) == 32, (
        f"rotation slots 19-50 must carry 32 r3-backlog queries, got "
        f"{len(stale)}"
    )
