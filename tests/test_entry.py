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


def test_round8_rotation_head_is_pinned():
    """The driver consumes ~50 CORRECTNESS rows in dict order, so the
    registry's head section IS the round-8 rotation contract
    (VERDICT r7 #2): 4 triaged tier-0 slots (the new routed-default
    kNN, the re-staged KMV twin, and the two re-attested
    representatives of the guard-only ADVICE fixes), then the ENTIRE
    46-row r4-latest backlog — after this round no registry query's
    latest driver attestation predates r5 config. Slots 51-55 are the
    five code-changed-but-output-identical queries deferred to round
    9's tier 0 (see the rotation comment in __spark_entry__.queries).
    An accidental reorder (e.g. a new query inserted at the literal
    top) would silently displace a re-attestation — pin it."""
    keys = list(entrymod.queries().keys())
    assert keys[:4] == [
        "q_knn_default",
        "q_stream_kmv_maintenance",
        "q_knn_pq",
        "q_part_coreness",
    ]
    assert keys[50:55] == [
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
    for r in (1, 2, 3, 4, 5, 6, 7):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            for q in json.load(open(path)):
                latest[q] = r
    # slots 5-50 burn the entire r4 backlog, in registry order
    assert all(latest.get(k) == 4 for k in keys[4:50]), [
        (k, latest.get(k)) for k in keys[4:50] if latest.get(k) != 4
    ]
    assert len(keys[4:50]) == 46
