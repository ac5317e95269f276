"""Exact distributed order statistics via iterative bracket descent
(operators/selection.py) — selection without a global sort.

No reference counterpart (the reference has no quantile surface);
north-star scale family alongside the q-digest.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.selection import (
    _rank_of,
    exact_quantiles,
    q_events_exact_quantiles,
)
from bigdataminingproject_spark.sources.tables import load_table

QS = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)


def _py_quantiles(values, qs):
    s = sorted(values)
    return {q: (_rank_of(q, len(s)), s[_rank_of(q, len(s)) - 1]) for q in qs}


def test_matches_python_sort_on_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    vals = [r["value"] for r in ev.select("value").collect() if r["value"] is not None]
    want = _py_quantiles(vals, QS)
    got = {
        r["q"]: (r["rank"], r["value"])
        for r in q_events_exact_quantiles(spark, sf_dir).collect()
    }
    assert got == want


def test_descent_path_exercised_with_tiny_bound(spark):
    """bound=25 forces several bin-count refinement passes on 5000
    rows; the answer must still be the exact sorted-rank element."""
    rnd = random.Random(42)
    vals = [rnd.gauss(100.0, 25.0) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["q"]: (r["rank"], r["value"])
        for r in exact_quantiles(df, "x", qs=QS, bins=8, bound=25).collect()
    }
    assert got == _py_quantiles(vals, QS)


def test_heavy_ties_collapse_bracket(spark):
    """A value carrying most of the mass collapses the bracket to a
    single point (clo == chi) instead of looping; ranks inside the tie
    run all resolve to that value."""
    vals = [7.5] * 4000 + [1.0] * 10 + [99.0] * 10
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", qs=(0.5, 0.9), bins=8, bound=25).collect()
    }
    assert got == {0.5: 7.5, 0.9: 7.5}


def test_rank_rule_matches_duckdb_quantile_disc(spark, sf_dir):
    """Empirical cross-check of the pinned inverse-CDF rank rule
    against DuckDB's quantile_disc on the real events column."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    got = {
        r["q"]: r["value"]
        for r in q_events_exact_quantiles(spark, sf_dir).collect()
    }
    for q in QS:
        want = con.execute(
            f"SELECT quantile_disc(value, {q}) FROM events"
        ).fetchone()[0]
        assert got[q] == want, (q, got[q], want)


def test_grouped_matches_python_sort(spark, sf_dir):
    from bigdataminingproject_spark.operators.selection import (
        q_events_grouped_exact_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    by_type: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        if r["value"] is not None and r["event_type"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["value"])
    want = {
        (t, q): (_rank_of(q, len(vs)), sorted(vs)[_rank_of(q, len(vs)) - 1])
        for t, vs in by_type.items()
        for q in (0.5, 0.9, 0.99)
    }
    got = {
        (r["event_type"], r["q"]): (r["rank"], r["value"])
        for r in q_events_grouped_exact_quantiles(spark, sf_dir).collect()
    }
    assert got == want


def test_grouped_descent_with_tiny_bound(spark):
    from bigdataminingproject_spark.operators.selection import (
        grouped_exact_quantiles,
    )

    rnd = random.Random(7)
    rows = [
        (k, rnd.uniform(0, 1000.0))
        for k in ("a", "b", "c")
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, x double")
    got = {
        (r["k"], r["q"]): (r["rank"], r["value"])
        for r in grouped_exact_quantiles(
            df, "k", "x", qs=(0.25, 0.5), bins=8, bound=20
        ).collect()
    }
    want = {}
    for k in ("a", "b", "c"):
        vs = sorted(v for kk, v in rows if kk == k)
        for q in (0.25, 0.5):
            want[(k, q)] = (_rank_of(q, len(vs)), vs[_rank_of(q, len(vs)) - 1])
    assert got == want


def test_grouped_supports_non_string_keys(spark):
    """The output schema derives the key dtype from the input — an
    integer tier column must come back as an integer column."""
    from bigdataminingproject_spark.operators.selection import (
        grouped_exact_quantiles,
    )

    rows = [(t, float(t * 100 + i)) for t in (1, 2) for i in range(50)]
    df = spark.createDataFrame(rows, "tier_id long, x double")
    out = grouped_exact_quantiles(df, "tier_id", "x", qs=(0.5,))
    assert dict(out.dtypes)["tier_id"] == "bigint"
    got = {(r["tier_id"], r["value"]) for r in out.collect()}
    assert got == {(1, 124.0), (2, 224.0)}


def test_grouped_key_guard(spark):
    from bigdataminingproject_spark.operators.selection import (
        SEL_MAX_KEYS,
        grouped_exact_quantiles,
    )

    df = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(SEL_MAX_KEYS + 1)],
        "k string, x double",
    )
    with pytest.raises(ValueError, match="grouped selection saw"):
        grouped_exact_quantiles(df, "k", "x", qs=(0.5,))


def _py_weighted(pairs, qs):
    """Reference: smallest v with cumulative weight >= q*W."""
    pairs = sorted((v, w) for v, w in pairs if w > 0)
    total = sum(w for _, w in pairs)
    out = {}
    for q in qs:
        t = q * float(total)
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= t:
                out[q] = v
                break
    return out


def test_weighted_matches_python_on_docs(spark, sf_dir):
    from bigdataminingproject_spark.operators.selection import (
        q_doc_weighted_length_quantiles,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = [
        (float(r["n_chars"]), int(r["n_chars"]))
        for r in docs.select("n_chars").collect()
        if r["n_chars"] is not None and r["n_chars"] > 0
    ]
    want = _py_weighted(pairs, (0.25, 0.5, 0.75, 0.9))
    got = {
        r["q"]: r["value"]
        for r in q_doc_weighted_length_quantiles(spark, sf_dir).collect()
    }
    assert got == want


def test_weighted_descent_with_tiny_bound(spark):
    from bigdataminingproject_spark.operators.selection import (
        weighted_exact_quantiles,
    )

    rnd = random.Random(11)
    rows = [(rnd.uniform(0, 100.0), rnd.randint(1, 50)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "x double, w long")
    got = {
        r["q"]: r["value"]
        for r in weighted_exact_quantiles(
            df, "x", "w", qs=(0.1, 0.5, 0.99), bins=8, bound=20
        ).collect()
    }
    assert got == _py_weighted(rows, (0.1, 0.5, 0.99))


def test_weighted_skew_one_value_holds_most_weight(spark):
    from bigdataminingproject_spark.operators.selection import (
        weighted_exact_quantiles,
    )

    rows = [(5.0, 10_000)] + [(float(i), 1) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, w long")
    got = {
        r["q"]: r["value"]
        for r in weighted_exact_quantiles(
            df, "x", "w", qs=(0.05, 0.5, 0.95), bins=8, bound=10
        ).collect()
    }
    assert got == _py_weighted(rows, (0.05, 0.5, 0.95))


def test_grouped_weighted_matches_python(spark, sf_dir):
    from bigdataminingproject_spark.operators.selection import (
        q_doc_source_weighted_length,
    )

    docs = load_table(spark, sf_dir, "documents")
    by_src: dict[str, list] = {}
    for r in docs.select("source", "n_chars").collect():
        if r["source"] is not None and r["n_chars"] and r["n_chars"] > 0:
            by_src.setdefault(r["source"], []).append(
                (float(r["n_chars"]), int(r["n_chars"]))
            )
    want = {}
    for src, pairs in by_src.items():
        w = _py_weighted(pairs, (0.5, 0.9))
        for q, v in w.items():
            want[(src, q)] = v
    got = {
        (r["source"], r["q"]): r["value"]
        for r in q_doc_source_weighted_length(spark, sf_dir).collect()
    }
    assert got == want
    assert len({k for k, _ in got}) > 1


def test_grouped_weighted_descent_tiny_bound(spark):
    from bigdataminingproject_spark.operators.selection import (
        grouped_weighted_exact_quantiles,
    )

    rnd = random.Random(19)
    rows = [
        (k, rnd.uniform(0, 100.0), rnd.randint(1, 9))
        for k in ("x", "y")
        for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    got = {
        (r["k"], r["q"]): r["value"]
        for r in grouped_weighted_exact_quantiles(
            df, "k", "v", "w", qs=(0.25, 0.75), bins=8, bound=20
        ).collect()
    }
    want = {}
    for k in ("x", "y"):
        pairs = [(v, w) for kk, v, w in rows if kk == k]
        for q, v in _py_weighted(pairs, (0.25, 0.75)).items():
            want[(k, q)] = v
    assert got == want


def test_mad_outliers_matches_python(spark, sf_dir):
    from bigdataminingproject_spark.operators.selection import (
        q_events_mad_outliers,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = [
        (r["event_type"], r["value"])
        for r in ev.select("event_type", "value").collect()
        if r["value"] is not None
    ]
    vals = sorted(v for _, v in rows)
    m = vals[_rank_of(0.5, len(vals)) - 1]
    devs = sorted(abs(v - m) for v in vals)
    mad = devs[_rank_of(0.5, len(devs)) - 1]
    want = {}
    for t, v in rows:
        n, o = want.get(t, (0, 0))
        want[t] = (n + 1, o + (1 if abs(v - m) > 3.0 * mad else 0))
    got = {
        r["event_type"]: (r["n_events"], r["n_outliers"])
        for r in q_events_mad_outliers(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(o for _, o in want.values()) > 0  # screen actually fires


def test_mad_outliers_resists_contamination(spark):
    """The robust property: planting extreme outliers must not move
    the median/MAD screen enough to mask them (a mean/std z-score
    would widen and pass them)."""
    from bigdataminingproject_spark.operators.selection import mad_outliers

    base = [("a", float(100 + (i % 21) - 10)) for i in range(2000)]
    spikes = [("a", 1e6)] * 40
    df = spark.createDataFrame(base + spikes, "g string, x double")
    row = mad_outliers(df, "x", "g", bins=8, bound=50).collect()[0]
    assert row["n_outliers"] == 40


def test_descent_with_negative_values_and_ties(spark):
    """Brackets spanning negative values and heavy duplicates must
    still land on the exact sorted ranks."""
    rnd = random.Random(3)
    vals = [rnd.uniform(-500.0, 500.0) for _ in range(2000)] + [-123.25] * 500
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["q"]: (r["rank"], r["value"])
        for r in exact_quantiles(df, "x", qs=QS, bins=8, bound=30).collect()
    }
    assert got == _py_quantiles(vals, QS)


def test_empty_and_nulls(spark):
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x").count() == 0
    just_nulls = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_quantiles(just_nulls, "x").count() == 0
    one = spark.createDataFrame([(42.0,)], "x double")
    rows = exact_quantiles(one, "x", qs=(0.5,)).collect()
    assert [(r["q"], r["rank"], r["value"]) for r in rows] == [(0.5, 1, 42.0)]
