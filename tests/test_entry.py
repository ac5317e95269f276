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


def test_round10_rotation_head_is_pinned():
    """The driver consumes ~50 CORRECTNESS rows in dict order, so the
    registry's head section IS the round-10 rotation contract
    (VERDICT r9 #3): the seven tier-0 rows first (six new round-10
    queries + the re-architected itemsim twin), then the ENTIRE
    remaining r5-latest backlog (every registry row whose newest
    driver attestation across CORRECTNESS_r01..r09 is round 5 —
    burning the r5 backlog to zero), then the round-10 code-touched
    re-attestations. An accidental reorder (e.g. a new query inserted
    at the literal top) would silently displace a backlog burn — pin
    the structure against the attestation JSONs themselves."""
    import json
    import os

    keys = list(entrymod.queries().keys())
    tier0 = [
        "q_embedding_knn_outliers_ivf",
        "q_lineitem_aqp_quantile_sample",
        "q4_order_priority",
        "q_events_xcorr",
        "q_events_seasonal_anomaly",
        "q_orders_dependence_profile",
        "q_events_theil_sen",
        "q_orders_benford",
        "q_stream_itemsim_maintenance",
    ]
    assert keys[: len(tier0)] == tier0
    latest = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in range(1, 10):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            for q in json.load(open(path)):
                latest[q] = r
    # the backlog block: every in-registry row still at r5-latest,
    # contiguous right after tier-0 and covering ALL of them
    r5_rows = {k for k in keys if latest.get(k) == 5}
    block = keys[len(tier0) : len(tier0) + len(r5_rows)]
    assert set(block) == r5_rows, (
        sorted(r5_rows - set(block)),
        [k for k in block if k not in r5_rows],
    )
    # the code-touched re-attestations follow immediately
    touched = keys[
        len(tier0) + len(r5_rows) : len(tier0) + len(r5_rows) + 5
    ]
    assert touched == [
        "q_events_mi",
        "q_events_chi2",
        "q_stream_mi_maintenance",
        "q_stream_chi2_maintenance",
        "q_orders_fd_profile",
    ]
