"""Round-9 operator unit tests: equi-depth histogram + selectivity,
bucketized interval join, item-item cosine, label-propagation
communities, winsorized stats, explicit-rank selection, AQP quantile.

No reference counterpart for any of these (the reference has no
statistics / join / recommendation surface); all are north-star
families whose cross-engine contract is carried by the DuckDB oracle
gate — these tests pin the ALGORITHMIC invariants (exactness vs a
Python model, bucket-join completeness vs a quadratic reference,
determinism) the oracle comparison alone would not localize.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.histogram import (
    equidepth_histogram,
    histogram_selectivity,
)
from bigdataminingproject_spark.operators.intervals import interval_join
from bigdataminingproject_spark.operators.recommend import item_cosine_topk
from bigdataminingproject_spark.operators.graph import label_propagation
from bigdataminingproject_spark.operators.selection import (
    exact_ranks,
    winsorized_stats,
)
from bigdataminingproject_spark.sources.tables import load_table


# ---------------------------------------------------------------- histogram
def test_equidepth_histogram_partitions_exactly(spark):
    rnd = random.Random(7)
    vals = [rnd.expovariate(0.02) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    hist = equidepth_histogram(df, "x", buckets=8).collect()
    assert [r["bucket"] for r in hist] == list(range(1, 9))
    assert sum(r["n_rows"] for r in hist) == len(vals)
    # equi-depth: every bucket within 1 of n/B on a tie-free column
    lo, hi = min(r["n_rows"] for r in hist), max(r["n_rows"] for r in hist)
    assert hi - lo <= 1
    # edges cover [min, max] and are non-decreasing
    assert hist[0]["lo"] == min(vals)
    assert hist[-1]["hi"] == max(vals)
    for a, b in zip(hist, hist[1:]):
        assert a["hi"] == b["lo"]


def test_equidepth_histogram_heavy_ties_emits_empty_buckets(spark):
    vals = [5.0] * 3900 + [1.0] * 50 + [9.0] * 50
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    hist = equidepth_histogram(df, "x", buckets=8).collect()
    assert len(hist) == 8  # duplicate boundaries still emit 8 rows
    assert sum(r["n_rows"] for r in hist) == 4000
    assert any(r["n_rows"] == 0 for r in hist)


def test_histogram_selectivity_matches_python_model(spark):
    rnd = random.Random(11)
    vals = [rnd.uniform(0.0, 200.0) for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = histogram_selectivity(df, "x", 20.0, 100.0).collect()[0]
    exact = sum(1 for v in vals if 20.0 <= v <= 100.0)
    assert row["exact_rows"] == exact
    # uniform data: interpolation should be within 2% of truth
    assert abs(row["est_rows"] - exact) / exact < 0.02


# ------------------------------------------------------------ interval join
def test_interval_join_equals_quadratic_reference(spark):
    rnd = random.Random(3)
    points = [(rnd.randrange(4), rnd.randrange(0, 100_000)) for _ in range(400)]
    ivals = [
        (i, rnd.randrange(4), s, s + rnd.randrange(1, 30_000))
        for i, s in enumerate(rnd.randrange(0, 90_000) for _ in range(60))
    ]
    pdf = spark.createDataFrame(points, "k int, p_us long")
    idf = spark.createDataFrame(ivals, "iid int, k int, s_us long, e_us long")
    got = {
        (r["iid"], r["p_us"])
        for r in interval_join(
            pdf, idf, "k", "p_us", "s_us", "e_us", 10_000
        ).collect()
    }
    want = {
        (i, p)
        for (i, k, s, e) in ivals
        for (pk, p) in points
        if pk == k and s <= p <= e
    }
    assert got == want  # bucket decomposition loses/duplicates nothing


def test_interval_join_fanout_is_bounded(spark):
    """An interval of length L explodes to exactly L DIV W + 1..2
    buckets — the equi-join rewrite stays linear, never cartesian."""
    idf = spark.createDataFrame(
        [(1, 0, 100_000)], "k int, s_us long, e_us long"
    )
    pdf = spark.createDataFrame([(1, 50)], "k int, p_us long")
    out = interval_join(pdf, idf, "k", "p_us", "s_us", "e_us", 10_000)
    assert out.count() == 1


# ----------------------------------------------------------------- item sim
def test_item_cosine_matches_python_model(spark):
    rnd = random.Random(5)
    rows = [(o, rnd.randrange(12)) for o in range(300) for _ in range(3)]
    df = spark.createDataFrame(rows, "o int, p int")
    got = {
        (r["item"], r["neighbor"]): (r["co_count"], r["cos_sim"])
        for r in item_cosine_topk(df, "o", "p", k=3, min_co=2).collect()
    }
    # python model
    baskets: dict[int, set] = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    n: dict[int, int] = {}
    co: dict[tuple, int] = {}
    for items in baskets.values():
        for p in items:
            n[p] = n.get(p, 0) + 1
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                co[(a, b)] = co.get((a, b), 0) + 1
    want = {}
    for item in n:
        cands = []
        for (a, b), c in co.items():
            if c < 2:
                continue
            if a == item:
                cands.append((b, c))
            elif b == item:
                cands.append((a, c))
        cands = [
            (nb, c, c / math.sqrt(n[item] * n[nb])) for nb, c in cands
        ]
        cands.sort(key=lambda t: (-t[2], t[0]))
        for nb, c, cs in cands[:3]:
            want[(item, nb)] = (c, cs)
    assert got == want


# -------------------------------------------------------------- communities
def test_lpa_separates_disconnected_cliques(spark):
    edges = [
        ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
        ("b1", "b2"), ("b1", "b3"), ("b2", "b3"), ("b3", "b4"),
    ]
    df = spark.createDataFrame(edges, "a string, b string")
    labels = {r["v"]: r["label"] for r in label_propagation(df).collect()}
    assert len({labels[v] for v in ("a1", "a2", "a3")}) == 1
    assert len({labels[v] for v in ("b1", "b2", "b3", "b4")}) == 1
    assert labels["a1"] != labels["b1"]


def test_lpa_is_deterministic(spark):
    rnd = random.Random(13)
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rnd.randrange(40), rnd.randrange(40)) for _ in range(150)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "a string, b string"
    )
    one = sorted(map(tuple, label_propagation(df).collect()))
    two = sorted(map(tuple, label_propagation(df).collect()))
    assert one == two


# ----------------------------------------------------------------- winsorize
def test_winsorized_stats_matches_python_model(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = [
        (r["event_type"], r["value"])
        for r in ev.select("event_type", "value").collect()
        if r["value"] is not None and r["event_type"] is not None
    ]
    got = {
        r["event_type"]: r for r in winsorized_stats(ev, "value", "event_type").collect()
    }
    by_g: dict[str, list] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        s = sorted(vs)
        n = len(s)
        qlo = s[max(1, math.ceil(0.05 * float(n))) - 1]
        qhi = s[max(1, math.ceil(0.95 * float(n))) - 1]
        r = got[g]
        assert r["p_lo_value"] == qlo and r["p_hi_value"] == qhi
        assert r["n_lo_clipped"] == sum(1 for v in vs if v < qlo)
        assert r["n_hi_clipped"] == sum(1 for v in vs if v > qhi)
        clipped = [min(max(v, qlo), qhi) for v in vs]
        want_mean = (
            math.floor(
                round(sum(clipped), 2) * 10000.0 / len(clipped) + 0.5
            )
            / 10000.0
        )
        assert r["win_mean"] == pytest.approx(want_mean, abs=1e-9)


# -------------------------------------------------------------- exact ranks
def test_exact_ranks_arbitrary_targets(spark):
    rnd = random.Random(17)
    vals = [rnd.gauss(0, 1) for _ in range(2500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = sorted(vals)
    ranks = (1, 2, 37, 1250, 2499, 2500)
    got = exact_ranks(df, "x", ranks)
    assert got == {r: s[r - 1] for r in ranks}


def test_exact_ranks_clamps_out_of_range(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    got = exact_ranks(df, "x", (0, -5, 99))
    assert got == {1: 0.0, 10: 9.0}
