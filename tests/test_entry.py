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


def test_round9_rotation_head_is_pinned():
    """The driver consumes ~50 CORRECTNESS rows in dict order, so the
    registry's head section IS the round-9 rotation contract
    (COVERAGE round-8b queue #1): the five round-8-deferred
    re-attestations first, then EVERY never-driver-attested row (the
    13 round-8b additions, q_stream_rollup_maintenance, and the
    round-9 additions), then the 47-row r5-latest backlog in registry
    order (spillover past the ~50-row cap rolls to round 10). An
    accidental reorder (e.g. a new query inserted at the literal top)
    would silently displace a re-attestation — pin it."""
    keys = list(entrymod.queries().keys())
    assert keys[:5] == [
        "q_knn_pq_rerank",
        "q_knn_ivfpq",
        "q_knn_ivfpq_rerank",
        "q_stream_kcore_maintenance",
        "q_stream_dedup",
    ]
    import json
    import os

    latest = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in (1, 2, 3, 4, 5, 6, 7, 8):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            for q in json.load(open(path)):
                latest[q] = r
    # after the deferred five, every never-driver-attested row sits
    # above the backlog; the tail of that block is the (growing)
    # round-9 additions list
    n_never = sum(1 for k in keys if k not in latest)
    never_block = keys[5 : 5 + n_never]
    assert all(k not in latest for k in never_block), [
        k for k in never_block if k in latest
    ]
    assert "q_stream_rollup_maintenance" in never_block
    # the backlog burn starts right after: r5-latest rows, oldest
    # staleness in the registry
    backlog_head = keys[5 + n_never : 5 + n_never + 10]
    assert all(latest.get(k) == 5 for k in backlog_head), [
        (k, latest.get(k)) for k in backlog_head if latest.get(k) != 5
    ]
