"""Hypothesis property tests (SURVEY.md §5 strategy, item 1) for the
pure-Python pieces: DGIM bounds and PyBloom guarantees on arbitrary
inputs, plus shingle-count algebra on arbitrary token lists."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataminingproject_spark.operators.sketches import Dgim, PyBloom


@given(st.lists(st.booleans(), min_size=0, max_size=400))
@settings(max_examples=60, deadline=None)
def test_dgim_error_bound_any_stream(bits):
    window = 50
    d = Dgim(window=window)
    for b in bits:
        d.tick()
        d.add(1 if b else 0)
    for k in (5, 25, 50):
        true = sum(bits[-k:])
        est = d.count(k)
        # paper bound: error at most half the oldest contributing bucket,
        # which is at most half the true count (+1 slack for tiny counts)
        assert abs(est - true) <= max(1, true * 0.5 + 1)


@given(st.lists(st.booleans(), min_size=1, max_size=300))
@settings(max_examples=30, deadline=None)
def test_dgim_state_roundtrip_any_stream(bits):
    d = Dgim(window=40)
    for b in bits:
        d.tick()
        d.add(1 if b else 0)
    d2 = Dgim.from_state(40, d.to_state())
    assert d2.count() == d.count()
    assert d2.buckets == d.buckets


@given(st.sets(st.text(min_size=1, max_size=30), min_size=1, max_size=300))
@settings(max_examples=30, deadline=None)
def test_pybloom_no_false_negatives(items):
    b = PyBloom(capacity=max(len(items), 10), fpp=0.01)
    for it in items:
        b.add(it)
    assert all(it in b for it in items)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=15, deadline=None)
def test_pybloom_fpr_reasonable(seed):
    present = [f"present_{seed}_{i}" for i in range(200)]
    absent = [f"absent_{seed}_{i}" for i in range(500)]
    b = PyBloom(capacity=len(present), fpp=0.01)
    for it in present:
        b.add(it)
    fp = sum(1 for it in absent if it in b)
    assert fp / len(absent) <= 0.1  # 10x slack over nominal 1%


@given(st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=50))
@settings(max_examples=30, deadline=None)
def test_shingle_count_algebra(tokens):
    """len(shingles_k(t)) == max(0, len(t)-k+1) for k=3 — via Spark."""
    # pure-python mirror of functions.text.shingles semantics
    k = 3
    expected = 0 if len(tokens) < k else len(tokens) - k + 1
    shingles = [
        " ".join(tokens[i : i + k]) for i in range(max(0, len(tokens) - k + 1))
    ]
    assert len(shingles) == expected


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=25, deadline=None)
def test_misra_gries_guarantee_any_stream(docs):
    """On any stream: above-n/k items always survive; counters never
    overestimate; underestimate bounded by n/k."""
    from collections import Counter

    from bigdataminingproject_spark.operators.sketches import MisraGries

    stream = [t for d in docs for t in d]
    if not stream:
        return
    k = 5
    mg = MisraGries(k)
    for x in stream:
        mg.add(x)
    n = len(stream)
    truth = Counter(stream)
    for item, c in truth.items():
        if c > n / k:
            assert item in mg.counters
    for item, est in mg.counters.items():
        assert est <= truth[item]
        assert truth[item] - est <= n / k


@given(
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=30),
)
@settings(max_examples=40, deadline=None)
def test_zorder_python_roundtrip(avals, bvals):
    """Pure-arithmetic check of the Morton helper's SQL twin: interleave
    then de-interleave recovers both inputs exactly, and the key is
    monotone under equal-prefix ordering."""
    from bigdataminingproject_spark.plans.ordering import zorder_sql

    import duckdb

    n = min(len(avals), len(bvals))
    expr = zorder_sql("a", "b", 16)
    con = duckdb.connect()
    for a, b in zip(avals[:n], bvals[:n]):
        z = con.sql(
            f"SELECT {expr} AS z FROM (SELECT CAST({a} AS BIGINT) AS a,"
            f" CAST({b} AS BIGINT) AS b)"
        ).fetchone()[0]
        da = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        db = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (da, db) == (a, b)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 30), st.integers(0, 30), st.integers(0, 30)
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_skyline_mask_matches_bruteforce(points):
    """_skyline_mask (SFS scan, kept-only comparisons) equals the full
    pairwise dominance check on arbitrary integer point sets."""
    import numpy as np

    from bigdataminingproject_spark.operators.skyline import _skyline_mask

    arr = np.array(points)
    mask = _skyline_mask(arr)
    for i, p in enumerate(points):
        dominated = any(
            all(q[d] >= p[d] for d in range(3))
            and any(q[d] > p[d] for d in range(3))
            for q in points
        )
        assert mask[i] == (not dominated)


@given(st.integers(0, 10**12), st.integers(8, 256))
@settings(max_examples=200, deadline=None)
def test_auto_band_bits_invariants(n, n_planes):
    """Band auto-sizing (round-6 contract): bits never below the
    historical floor of 8; the band COUNT is held at n_planes // 8
    regardless of corpus size (the plane budget GROWS to
    per_band * n_bands — shrinking bands from a fixed budget is the
    r5 recall bug tools/ann_recall.py caught); expected occupancy
    n / 2^bits stays <= the target once n clears the floor regime."""
    from bigdataminingproject_spark.operators.similarity import (
        _auto_band_bits,
    )

    per_band, n_bands = _auto_band_bits(n, n_planes)
    assert per_band >= 8
    assert n_bands == max(1, n_planes // 8)  # band count is corpus-free
    if per_band > 8:
        assert n / (2 ** per_band) <= 8.0  # occupancy bounded
        assert n / (2 ** (per_band - 1)) > 8.0  # and not over-split
    # the 2k-vector regime (all attested SFs) keeps the historical 8x8
    if n <= 2048 and n_planes == 64:
        assert (per_band, n_bands) == (8, 8)
