"""Cross-engine proof of the integer-quantization parity rule.

The repo's convention for oracle-checked money/ratio outputs is:
never ``round(double, d)`` an aggregate (Spark rounds the shortest
decimal rendering, DuckDB the binary value — they diverge at decimal
midpoints like 4201.315); instead quantize to integers on the value
grid (``round(sum * 10000)`` → BIGINT). This test drives both engines
over adversarial midpoint-heavy data and asserts the quantized path
agrees bit-for-bit. (See memory: q9/q11/quality basis points.)
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def _grid_data():
    # Values on the 1e-4 grid whose group sums land EXACTLY on 2dp
    # midpoints (x.xx50) — the divergence zone for round(sum, 2).
    rows = []
    for g in range(200):
        # sum = g + 0.005 → always a 2dp midpoint
        rows.append((g, g + 0.0025))
        rows.append((g, 0.0025))
        # noise rows on the grid that cancel
        rows.append((g, 123.4567))
        rows.append((g, -123.4567))
    return pd.DataFrame(rows, columns=["g", "v"])


def test_quantized_sums_match_duckdb_on_midpoints(spark):
    pdf = _grid_data()
    sdf = spark.createDataFrame(pdf)
    got = {
        r.g: r.q
        for r in sdf.groupBy("g")
        .agg(
            (F.round(F.sum("v") * 10000).cast("bigint")).alias("q")
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        g: q
        for g, q in con.execute(
            "SELECT g, CAST(round(sum(v) * 10000) AS BIGINT) FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want
    # and the quantized values are the exact grid integers
    assert all(got[g] == g * 10000 + 50 for g in range(200))


def test_basis_point_ratios_match_duckdb(spark):
    # ratios of arbitrary integers: same IEEE expression on both
    # engines → same double → same round-to-integer (midpoint integers
    # are exactly representable, unlike midpoint 2dp decimals)
    pdf = pd.DataFrame(
        [(i, 1 + (i * 7919) % 997, 1 + (i * 104729) % 9973) for i in range(2000)],
        columns=["i", "a", "b"],
    )
    sdf = spark.createDataFrame(pdf)
    got = {
        r.i: r.bp
        for r in sdf.select(
            "i",
            F.round(F.lit(10000.0) * F.col("a") / F.col("b"))
            .cast("bigint")
            .alias("bp"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        i: bp
        for i, bp in con.execute(
            "SELECT i, CAST(round(10000.0 * a / b) AS BIGINT) FROM t"
        ).fetchall()
    }
    assert got == want
