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


def test_round5_rotation_head_is_pinned():
    """The driver consumes ~50 CORRECTNESS rows in dict order, so the
    registry's head section IS the round-5 rotation contract: 5 tier-0
    queries (2 new, 1 renamed, 2 ADVICE-fix re-attestations) followed
    by 45 of the 50-query r1/r2 attestation backlog. An accidental
    reorder (e.g. a new query inserted at the literal top) would
    silently displace a backlog re-attestation — pin it."""
    keys = list(entrymod.queries().keys())
    assert keys[:5] == [
        "q_corpus_curation_incremental",
        "q_stream_hourly_maintenance",
        "q_embedding_neardup_anchor",
        "q_doc_association_rules",
        "q_events_session_paths",
    ]
    import json
    import os

    latest = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in (1, 2, 3, 4):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            for q in json.load(open(path)):
                latest[q] = r
    backlog_in_head = [k for k in keys[5:50] if latest.get(k, 9) <= 2]
    assert len(backlog_in_head) == 45, (
        f"rotation head must carry 45 backlog queries, got "
        f"{len(backlog_in_head)}"
    )
