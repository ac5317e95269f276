"""Guard: no oracle may emit a HUGEINT (int128) output column.

The driver's correctness hasher distinguishes DuckDB's HUGEINT from
Spark's BIGINT even when the values are numerically identical (round-2
post-mortem: q12_priority_by_returnflag and q_media_features were the
only two red rows, and both carried an uncast ``sum(<int>)``, which
DuckDB widens to HUGEINT).  Every integer aggregate in an oracle must be
wrapped in ``CAST(... AS BIGINT)``.  This test runs every oracle's twin
at sf0.001 and asserts the *result* types — the one property the local
string-normalizing checker cannot see.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

FORBIDDEN = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_no_hugeint_output_columns(con):
    bad = []
    for name, query in entrymod.oracle_sql().items():
        rel = con.sql(query)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ).upper() in FORBIDDEN:
                bad.append((name, col, str(typ)))
    assert not bad, (
        "oracle columns widened to int128 — wrap in CAST(... AS BIGINT): "
        f"{bad}"
    )


def test_queries_and_oracles_consistent():
    """Every oracle key must exist in queries(); count drift is a doc bug."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs, f"orphan oracles: {sorted(os_ - qs)}"
