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


def test_xcorr_detects_known_lead(spark):
    """b = a shifted right by 2 hours (a leads b by 2) over a noisy
    base: the CCF peak sits at lag +2 with r ~ 1."""
    rng = random.Random(7)
    base = [rng.randint(0, 50) for _ in range(120)]
    rows = []
    for h, c in enumerate(base):
        rows += [("a", h, 1.0)] * c
    for h, c in enumerate(base):
        rows += [("b", h + 2, 1.0)] * c
    from bigdataminingproject_spark.operators.trends import (
        hourly_crosscorr,
    )

    out = {
        r["lag"]: r["ccf"]
        for r in hourly_crosscorr(
            _mk_events(spark, rows), "a", "b", max_lag=4
        ).collect()
    }
    assert out[2] == pytest.approx(1.0, abs=1e-4)
    assert all(
        out[lag] is None or out[lag] < 0.9
        for lag in out
        if lag != 2
    )


def test_xcorr_symmetry_with_swapped_keys(spark):
    """ccf_ab(lag) == ccf_ba(-lag) — the lead/lag sign convention."""
    rng = random.Random(11)
    rows = []
    for h in range(60):
        rows += [("a", h, 1.0)] * rng.randint(0, 8)
        rows += [("b", h, 1.0)] * rng.randint(0, 8)
    from bigdataminingproject_spark.operators.trends import (
        hourly_crosscorr,
    )

    ev = _mk_events(spark, rows)
    ab = {
        r["lag"]: r["ccf"]
        for r in hourly_crosscorr(ev, "a", "b", max_lag=3).collect()
    }
    ba = {
        r["lag"]: r["ccf"]
        for r in hourly_crosscorr(ev, "b", "a", max_lag=3).collect()
    }
    for lag in ab:
        assert ab[lag] == pytest.approx(ba[-lag], abs=1e-6)


def test_seasonal_anomaly_flags_injected_spike(spark):
    """A flat 24h-periodic series with one spiked hour: the spike is
    the top anomaly, with a positive z and the cell-mean baseline."""
    rows = []
    for day in range(6):
        for hod in range(24):
            rows += [("a", day * 24 + hod, 1.0)] * (5 + hod % 3)
    rows += [("a", 3 * 24 + 7, 1.0)] * 40  # spike at day 3, hod 7
    from bigdataminingproject_spark.operators.trends import (
        seasonal_anomalies,
    )

    top = seasonal_anomalies(
        _mk_events(spark, rows), top_n=3
    ).collect()
    assert top[0]["h"] == 3 * 24 + 7
    assert top[0]["z"] > 0
    # baseline for hod 7 = mean over the 6 days (5 spiked days at 6,
    # one at 46)
    assert top[0]["expected"] == pytest.approx((5 * 6 + 46) / 6, abs=1e-6)


def test_seasonal_anomaly_constant_cells_excluded(spark):
    """A perfectly periodic series has zero variance in every
    (type, hod) cell — no anomalies to report."""
    rows = []
    for day in range(4):
        for hod in range(24):
            rows += [("a", day * 24 + hod, 1.0)] * (1 + hod % 2)
    from bigdataminingproject_spark.operators.trends import (
        seasonal_anomalies,
    )

    assert (
        seasonal_anomalies(_mk_events(spark, rows), top_n=10).count()
        == 0
    )


def test_theil_sen_ignores_outlier_hour(spark):
    """A clean slope-2 series with one wild spike: OLS moves, the
    Theil-Sen median slope stays at 2."""
    rows = []
    for h in range(48):
        rows += [("a", h, 1.0)] * (2 * h + 1)
    rows += [("a", 20, 1.0)] * 500  # outlier spike
    from bigdataminingproject_spark.operators.trends import (
        theil_sen_trend,
    )

    out = theil_sen_trend(_mk_events(spark, rows)).collect()[0]
    assert out["sen_slope_per_hour"] == pytest.approx(2.0, abs=0.1)
    assert out["n_pairs"] == 48 * 47 // 2


def test_theil_sen_exact_on_linear_series(spark):
    rows = []
    for h in range(24):
        rows += [("a", h, 1.0)] * (3 * h + 5)
    from bigdataminingproject_spark.operators.trends import (
        theil_sen_trend,
    )

    out = theil_sen_trend(_mk_events(spark, rows)).collect()[0]
    assert out["sen_slope_per_hour"] == pytest.approx(3.0, abs=1e-9)
