"""Dependence-profiling + Poisson-bootstrap unit tests (round 9).

The oracle gate carries the cross-engine contract; these pin the
algorithmic invariants: MI against a Python model and its information
identities, g3 against a brute-force Python count, bootstrap
determinism and coverage behavior.
"""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.aqp import (
    BOOT_DENOM,
    BOOT_THRESHOLDS,
    poisson_bootstrap_means,
)
from bigdataminingproject_spark.operators.profiling import (
    fd_profile,
    mutual_information,
)


def _mi_py(pairs):
    n = len(pairs)
    cxy = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    mi = sum(
        (c / n) * math.log(n * c / (cx[x] * cy[y]))
        for (x, y), c in cxy.items()
    )
    hx = math.log(n) - sum(c * math.log(c) for c in cx.values()) / n
    hy = math.log(n) - sum(c * math.log(c) for c in cy.values()) / n
    return mi, hx, hy


def test_mi_matches_python_model(spark):
    rnd = random.Random(5)
    pairs = [
        (rnd.choice("abc"), rnd.choice("xyzw") if rnd.random() < 0.7
         else "x")
        for _ in range(2000)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    out = mutual_information(df, F.col("a"), F.col("b")).collect()[0]
    mi, hx, hy = _mi_py(pairs)
    assert out["mi_nats"] == pytest.approx(mi, abs=2e-6)
    assert out["h_x"] == pytest.approx(hx, abs=2e-6)
    assert out["h_y"] == pytest.approx(hy, abs=2e-6)
    assert out["nmi"] == pytest.approx(mi / math.sqrt(hx * hy), abs=2e-6)
    assert out["n_rows"] == 2000


def test_mi_identical_columns_equals_entropy(spark):
    pairs = [("a", "a")] * 10 + [("b", "b")] * 30 + [("c", "c")] * 60
    df = spark.createDataFrame(pairs, "a string, b string")
    out = mutual_information(df, F.col("a"), F.col("b")).collect()[0]
    assert out["mi_nats"] == out["h_x"] == out["h_y"]
    assert out["nmi"] == pytest.approx(1.0)


def test_mi_independent_columns_is_zero(spark):
    # perfectly balanced product distribution -> exactly independent
    pairs = [(x, y) for x in "ab" for y in "cd" for _ in range(25)]
    df = spark.createDataFrame(pairs, "a string, b string")
    out = mutual_information(df, F.col("a"), F.col("b")).collect()[0]
    assert out["mi_nats"] == pytest.approx(0.0, abs=1e-9)


def test_fd_profile_exact_g3(spark):
    rows = (
        [("k1", "v1")] * 5
        + [("k1", "v2")] * 3   # k1 violates: delete 3
        + [("k2", "v1")] * 4   # k2 clean
        + [("k3", "v1"), ("k3", "v2"), ("k3", "v3")]  # delete 2
    )
    df = spark.createDataFrame(rows, "det string, dep string")
    out = fd_profile(df, [("det", "dep")]).collect()[0]
    assert out["n_rows"] == 15
    assert out["n_det"] == 3
    assert out["n_pairs"] == 6
    assert not out["holds"]
    assert out["g3_rows"] == 5
    assert out["g3_err"] == pytest.approx(5 / 15, abs=1e-6)


def test_fd_profile_holding_fd(spark):
    rows = [(i, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "det int, dep int")
    out = fd_profile(df, [("det", "dep")]).collect()[0]
    assert out["holds"] and out["g3_rows"] == 0


def _py_weight(key: str, r: int) -> int:
    h = hashlib.md5(f"{key}:{r}".encode()).hexdigest()
    u = int(h[:12], 16) % BOOT_DENOM
    return sum(1 for t in BOOT_THRESHOLDS if u >= t)


def test_bootstrap_weights_match_hash_staircase():
    """The Python replica of the weight rule behaves like Poisson(1):
    mean ~1, P(0) ~ 1/e over many draws (sanity of the thresholds)."""
    ws = [_py_weight(str(i), r) for i in range(500) for r in range(1, 5)]
    mean = sum(ws) / len(ws)
    p0 = sum(1 for w in ws if w == 0) / len(ws)
    assert mean == pytest.approx(1.0, abs=0.05)
    assert p0 == pytest.approx(math.exp(-1), abs=0.04)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    rnd = random.Random(9)
    rows = [("g", i, float(round(rnd.uniform(1, 99), 2)))
            for i in range(800)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    cents = F.floor(F.col("v") * 100 + F.lit(0.5))

    def run():
        return poisson_bootstrap_means(
            df, "k", F.col("id").cast("string"), cents, unit_scale=100
        ).collect()

    a, b = run(), run()
    assert a == b  # hash-deterministic, no RNG
    r = a[0]
    assert r["n_rows"] == 800
    assert r["boot_lo"] < r["mean_value"] < r["boot_hi"]
    # ~94% interval on an 800-row mean of U(1,99): width well under 20
    assert 0 < r["boot_width"] < 20


def test_bootstrap_weighted_sums_match_python(spark):
    """Exact-replica check: Spark's per-replica weighted means equal a
    Python evaluation of the same hash staircase on the same rows."""
    rows = [("g", i, float(i % 7 + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    cents = F.floor(F.col("v") * 100 + F.lit(0.5))
    out = poisson_bootstrap_means(
        df, "k", F.col("id").cast("string"), cents, unit_scale=100,
        replicas=8,
    ).collect()[0]
    means = []
    for r in range(1, 9):
        swy = sum(_py_weight(str(i), r) * int(v * 100 + 0.5)
                  for _, i, v in rows)
        sw = sum(_py_weight(str(i), r) for _, i, v in rows)
        means.append(swy / sw / 100)
    means.sort()
    assert out["boot_lo"] == pytest.approx(means[1], abs=1e-6)
    assert out["boot_hi"] == pytest.approx(means[-2], abs=1e-6)


def _mk_ts_events(spark, rows):
    """rows: (event_type, hour, value)"""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(hours=h), k, float(v))
        for i, (k, h, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double"
    )


def test_psi_zero_for_identical_halves(spark):
    from bigdataminingproject_spark.operators.profiling import psi_drift

    rnd = random.Random(23)
    vals = [round(rnd.uniform(0, 100), 2) for _ in range(500)]
    rows = [("a", 10, v) for v in vals] + [("a", 400, v) for v in vals]
    out = psi_drift(_mk_ts_events(spark, rows)).collect()
    assert len(out) == 1
    # same value multiset in both halves: PSI ~ 0 (smoothing keeps it
    # tiny but nonzero only via count differences — here none)
    assert abs(out[0]["psi"]) < 1e-9
    assert out[0]["n_ref"] == out[0]["n_cur"] == 500


def test_psi_detects_mean_shift(spark):
    from bigdataminingproject_spark.operators.profiling import psi_drift

    rnd = random.Random(29)
    rows = [("a", 10, round(rnd.uniform(0, 50), 2)) for _ in range(500)]
    rows += [("a", 400, round(rnd.uniform(40, 90), 2)) for _ in range(500)]
    out = psi_drift(_mk_ts_events(spark, rows)).collect()[0]
    assert out["psi"] > 0.25  # "major drift" regime


def test_chi2_matches_python_model(spark):
    from bigdataminingproject_spark.operators.profiling import (
        chi_square,
        contingency_cells,
    )

    rnd = random.Random(31)
    rows = [(rnd.choice("ab"), rnd.choice("xyz")) for _ in range(1000)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = chi_square(
        contingency_cells(df, F.col("x"), F.col("y"))
    ).collect()[0]
    cxy = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    n = len(rows)
    chi2 = sum(
        (cxy.get((x, y), 0) - cx[x] * cy[y] / n) ** 2 / (cx[x] * cy[y] / n)
        for x in cx for y in cy
    )
    assert out["chi2"] == pytest.approx(chi2, abs=1e-4)
    assert out["dof"] == 2
    assert out["cramers_v"] == pytest.approx(
        math.sqrt(chi2 / (n * 1)), abs=1e-5
    )


def test_chi2_independent_layout_is_zero(spark):
    from bigdataminingproject_spark.operators.profiling import (
        chi_square,
        contingency_cells,
    )

    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(25)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = chi_square(
        contingency_cells(df, F.col("x"), F.col("y"))
    ).collect()[0]
    assert out["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_dependence_profile_labels_and_perfect_dependence(spark):
    from bigdataminingproject_spark.operators.profiling import (
        dependence_profile,
    )

    df = spark.createDataFrame(
        [(i, i % 3, (i % 3) * 10, i % 2) for i in range(60)],
        "id long, a int, b int, c int",
    )
    out = dependence_profile(
        df,
        [
            ("a", "b", F.col("a"), F.col("b")),  # b = f(a): NMI = 1
            ("a", "c", F.col("a"), F.col("c")),  # independent: MI ~ 0
        ],
    ).collect()
    rows = {(r["col_x"], r["col_y"]): r for r in out}
    assert rows[("a", "b")]["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert abs(rows[("a", "c")]["mi_nats"]) < 1e-6
    # pinned emit order: (col_x, col_y)
    assert [(r["col_x"], r["col_y"]) for r in out] == [
        ("a", "b"),
        ("a", "c"),
    ]


def test_dependence_profile_empty_candidates(spark):
    from bigdataminingproject_spark.operators.profiling import (
        dependence_profile,
    )

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    out = dependence_profile(df, [])
    assert out.count() == 0
    assert out.columns == [
        "col_x", "col_y", "n_rows", "h_x", "h_y", "mi_nats", "nmi",
    ]


def test_fd_profile_empty_candidates(spark):
    from bigdataminingproject_spark.operators.profiling import (
        fd_profile,
    )

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    out = fd_profile(df, [])
    assert out.count() == 0
    assert out.columns[:2] == ["determinant", "dependent"]


def test_contingency_cells_drop_null_keys(spark):
    """NULL x/y rows are excluded so N, margins, and the cell sum
    cover the same population (ADVICE r9)."""
    from bigdataminingproject_spark.operators.profiling import (
        contingency_cells,
        mi_from_cells,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 2), (None, 1), (2, None)],
        "x int, y int",
    )
    cells = contingency_cells(df, F.col("x"), F.col("y"))
    assert cells.agg(F.sum("nxy")).collect()[0][0] == 3
    out = mi_from_cells(cells).collect()[0]
    assert out["n_rows"] == 3


def test_benford_profile_exact_small_case(spark):
    from bigdataminingproject_spark.operators.profiling import (
        benford_profile,
    )

    # cents: 123, 19999, 100, 950, 950 -> first digits 1,1,1,9,9
    df = spark.createDataFrame(
        [(1.23,), (199.99,), (1.00,), (9.50,), (9.50,), (0.0,), (-5.0,)],
        "v double",
    )
    rows = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert len(rows) == 9
    assert rows[1]["n_obs"] == 3 and rows[9]["n_obs"] == 2
    assert rows[2]["n_obs"] == 0
    assert rows[1]["obs_p"] == pytest.approx(0.6, abs=1e-9)
    import math

    assert rows[1]["benford_p"] == pytest.approx(
        math.log10(2), abs=1e-6
    )


def test_benford_profile_empty_positive_set(spark):
    from bigdataminingproject_spark.operators.profiling import (
        benford_profile,
    )

    df = spark.createDataFrame([(0.0,), (-1.0,)], "v double")
    assert benford_profile(df, "v").count() == 0
