"""AQP hash-sample estimation (operators/aqp.py): python md5 parity of
the deterministic sample, exact-integer moment accounting, and the
estimator algebra.

No reference counterpart (north-star OLAP family: BlinkDB-style
sampled aggregation with CLT error bars).
"""

from __future__ import annotations

import hashlib
import math

from bigdataminingproject_spark.operators.aqp import (
    AQP_RATE_INV,
    q_lineitem_aqp_revenue,
)
from bigdataminingproject_spark.sources.tables import load_table


def _py_hash48(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:12], 16)


def _py_reference(rows, rate_inv):
    s = sq = n = exact = 0
    for okey, lineno, ep, disc in rows:
        u = round(ep * (1 - disc) * 10000)
        exact += u
        if _py_hash48(f"{okey}-{lineno}") % rate_inv == 0:
            s += u
            sq += u * u
            n += 1
    p = 1.0 / rate_inv
    est = round(s / p / 10000.0, 2)
    ex = round(exact / 10000.0, 2)
    ci = round(1.96 * math.sqrt(sq * (1.0 - p) / (p * p)) / 10000.0, 2)
    rel = math.floor(abs(est - ex) * 100.0 * 10000.0 / ex + 0.5) / 10000.0
    return n, est, ex, rel, ci


def test_matches_python_reference(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    rows = [tuple(r) for r in li.collect()]
    want = _py_reference(rows, AQP_RATE_INV)
    got = q_lineitem_aqp_revenue(spark, sf_dir).collect()[0]
    assert (
        got["n_sampled"],
        got["est"],
        got["exact"],
        got["rel_err_pct"],
        got["ci95_half"],
    ) == want
    # the sample is real: some rows in, most rows out
    assert 0 < got["n_sampled"] < len(rows)


def test_grouped_matches_python_reference(spark, sf_dir):
    from bigdataminingproject_spark.operators.aqp import (
        q_lineitem_aqp_by_flag,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    by_flag: dict = {}
    for r in li.collect():
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_orderkey"], r["l_linenumber"], r["l_extendedprice"], r["l_discount"])
        )
    want = {
        flag: _py_reference(rows, AQP_RATE_INV)
        for flag, rows in by_flag.items()
    }
    got = {
        r["l_returnflag"]: (
            r["n_sampled"],
            r["est"],
            r["exact"],
            r["rel_err_pct"],
            r["ci95_half"],
        )
        for r in q_lineitem_aqp_by_flag(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) >= 3


def test_estimate_within_its_error_bar_at_sf001(spark):
    """Not a theorem (a 95% interval misses 5% of the time) but a
    pinned empirical fact on sf0.01's fixed deterministic sample
    (n=594; at sf0.001's n=46 the same sample legitimately sits ~2.8
    sigma out, which is why this pins the larger fixture) — if a code
    change moves the estimate outside its own bar here, the estimator
    algebra changed."""
    r = q_lineitem_aqp_revenue(spark, "/root/testdata/sf0.01").collect()[0]
    assert r["n_sampled"] == 594
    assert abs(r["est"] - r["exact"]) <= r["ci95_half"]
    assert r["rel_err_pct"] < 5.0
