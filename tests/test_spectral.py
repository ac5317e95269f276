"""Gram-free power iteration vs numpy ground truth — the DuckDB oracle
replays the same quantized arithmetic, so only an independent third
implementation (numpy eigendecomposition of the explicitly formed
second-moment matrix) can catch a wrong-math-on-both-sides bug."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bigdataminingproject_spark.operators.spectral import (
    power_iteration_top_pc,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: dominant direction along a fixed unit vector
    d = 16
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    n = 400
    coeff = rng.normal(scale=5.0, size=(n, 1))
    noise = rng.normal(scale=0.5, size=(n, d))
    x = (coeff * u + noise).astype(np.float32)
    rows = [(i, [float(c) for c in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, x.astype(np.float64)


def test_matches_numpy_dominant_eigenvector(spark, vecs):
    df, x = vecs
    out = power_iteration_top_pc(df, dim=16, iters=12).collect()
    got = np.array([r["component"] for r in sorted(out, key=lambda r: r["j"])])
    m = x.T @ x
    w, v = np.linalg.eigh(m)
    truth = v[:, -1]
    nz = np.nonzero(truth)[0]
    if truth[nz[0]] < 0:
        truth = -truth
    # direction agreement (power iteration converges geometrically in
    # the eigengap; 12 iterations on a 100:1 spectrum is plenty)
    assert abs(float(np.dot(got, truth))) > 0.9999
    eig = out[0]["eigval"]
    # eigval is ||A^T A v|| at the LAST iterate -> approaches lambda_max
    assert eig == pytest.approx(float(w[-1]), rel=1e-3)


def test_deterministic_across_runs(spark, vecs):
    df, _ = vecs
    a = [(r["j"], r["component"]) for r in power_iteration_top_pc(df, dim=16, iters=4).collect()]
    b = [(r["j"], r["component"]) for r in power_iteration_top_pc(df, dim=16, iters=4).collect()]
    assert sorted(a) == sorted(b)


def test_sign_canonicalized(spark, vecs):
    df, _ = vecs
    out = sorted(
        power_iteration_top_pc(df, dim=16, iters=4).collect(),
        key=lambda r: r["j"],
    )
    first_nz = next(r["component"] for r in out if r["component"] != 0.0)
    assert first_nz > 0


def test_zero_corpus_survives(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = power_iteration_top_pc(df, dim=4, iters=3).collect()
    assert len(out) == 4
    assert all(math.isfinite(r["component"]) for r in out)
