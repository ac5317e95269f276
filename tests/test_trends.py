"""Trends-family unit tests (round 9): per-group OLS from mergeable
sufficient statistics, hourly autocorrelation, CUSUM changepoints.

No reference counterpart (the reference has no numeric/time-series
surface); the cross-engine contract is carried by the DuckDB oracle
gate — these tests pin the ALGORITHMIC invariants the oracle alone
would not localize: exactness vs a Python OLS model, the
closed-under-merge property the streaming twin relies on, and the
CUSUM argmax/tie rules.
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.trends import (
    REG_BASE_US,
    cusum_changepoints,
    fold_regression_partials,
    finish_regression,
    group_linear_trend,
    hourly_autocorr,
    hourly_series,
    regression_partials,
)

BASE = dt.datetime(2024, 1, 1)


def _mk_events(spark, rows):
    """rows: (event_type, hours_after_base (float ok), value)"""
    data = [
        (i, BASE + dt.timedelta(hours=h), k, float(v))
        for i, (k, h, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double"
    )


def _py_ols(pts):
    """Exact-model OLS over (x_hour_int, y_cents_int) pairs."""
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    cov_n = n * sxy - sx * sy
    var_xn = n * sxx - sx * sx
    slope = cov_n / var_xn / 100
    icept = (sy - cov_n / var_xn * sx) / n / 100
    return slope, icept


def test_linear_trend_matches_python_model(spark):
    rnd = random.Random(3)
    rows = []
    pts = []
    for i in range(500):
        h = rnd.randrange(0, 720)
        v = round(1.5 * h / 100 + rnd.uniform(0, 50), 2)
        rows.append(("click", h, v))
        pts.append((h, int(math.floor(v * 100 + 0.5))))
    out = group_linear_trend(_mk_events(spark, rows)).collect()
    assert len(out) == 1
    slope, icept = _py_ols(pts)
    assert out[0]["slope_per_hour"] == pytest.approx(slope, abs=5e-7)
    assert out[0]["intercept"] == pytest.approx(icept, abs=5e-7)
    assert 0.0 <= out[0]["r2"] <= 1.0


def test_regression_partials_fold_is_exact(spark):
    """Splitting the input arbitrarily and folding partials must give
    bit-identical output to the single-pass batch (integer sums)."""
    rnd = random.Random(11)
    rows = [
        (rnd.choice(["a", "b"]), rnd.randrange(0, 300),
         round(rnd.uniform(0.01, 400), 2))
        for _ in range(400)
    ]
    df = _mk_events(spark, rows)
    whole = {
        r["event_type"]: r.asDict()
        for r in group_linear_trend(df).collect()
    }
    parts = [
        regression_partials(df.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    folded = {
        r["event_type"]: r.asDict()
        for r in finish_regression(
            fold_regression_partials(stacked)
        ).collect()
    }
    assert folded == whole


def test_linear_trend_constant_y_has_null_r2_zero_slope(spark):
    rows = [("a", h, 7.00) for h in range(10)]
    out = group_linear_trend(_mk_events(spark, rows)).collect()
    assert out[0]["slope_per_hour"] == 0.0
    assert out[0]["r2"] is None  # zero y-variance: r² undefined


def test_hourly_series_fills_gaps_with_zero(spark):
    rows = [("a", 0, 1.0), ("a", 0, 1.0), ("a", 5, 1.0)]
    s = {r["h"]: r["c"] for r in hourly_series(_mk_events(spark, rows)).collect()}
    assert s == {0: 2, 1: 0, 2: 0, 3: 0, 4: 0, 5: 1}


def test_autocorr_detects_periodicity(spark):
    # period-6 hourly pattern over 20 cycles: ACF peaks at lag 6
    rows = []
    for h in range(120):
        n = 8 if h % 6 == 0 else 1
        rows.extend([("a", h, 1.0)] * n)
    acf = {r["lag"]: r["acf"] for r in
           hourly_autocorr(_mk_events(spark, rows), max_lag=8).collect()}
    assert acf[6] > 0.9
    assert acf[1] < 0.3
    # pair counts shrink with lag
    out = hourly_autocorr(_mk_events(spark, rows), max_lag=8).collect()
    npairs = {r["lag"]: r["n_pairs"] for r in out}
    assert npairs[1] == 119 and npairs[8] == 112


def test_autocorr_constant_series_is_null(spark):
    rows = [("a", h, 1.0) for h in range(30)]
    out = hourly_autocorr(_mk_events(spark, rows), max_lag=3).collect()
    assert all(r["acf"] is None for r in out)


def test_cusum_finds_injected_shift(spark):
    # rate 2/hour for h<40, 10/hour for h>=40: CUSUM valley at h=39
    rows = []
    for h in range(80):
        rows.extend([("a", h, 1.0)] * (2 if h < 40 else 10))
    out = cusum_changepoints(_mk_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cp_hour"] == 39  # |S| peaks at the last pre-shift hour
    assert r["n_hours"] == 80
    assert r["mean_per_hour"] == pytest.approx(6.0)
    # peak magnitude = 40 hours * (2 - 6) = -160
    assert r["cusum_peak"] == pytest.approx(-160.0)


def test_cusum_ties_break_to_earliest_hour(spark):
    # perfectly flat series: every prefix sum is 0.0 -> earliest wins
    rows = [("a", h, 1.0) for h in range(12)]
    out = cusum_changepoints(_mk_events(spark, rows)).collect()
    assert out[0]["cp_hour"] == 0
    assert out[0]["cusum_peak"] == 0.0


def test_regression_base_epoch_is_pinned():
    assert REG_BASE_US == int(
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
