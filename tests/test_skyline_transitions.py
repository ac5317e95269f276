"""Skyline (Pareto frontier) and Markov transition matrix operators.

The skyline tests verify the bucketed strict-suffix-max plan against a
brute-force Python dominance check (including forced multi-bucket
splits, duplicate points, and per-group independence); the transition
tests recompute sequences by hand.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.events import transition_matrix
from bigdataminingproject_spark.operators.skyline import (
    skyline2d,
    skyline2d_points,
)


def brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in points
        )
        if not dominated:
            out.append(p)
    return set(out)


def test_skyline_matches_bruteforce_with_ties(spark):
    pts = [
        (10, 1), (10, 5), (9, 6), (8, 6), (8, 2), (7, 7), (7, 7),
        (6, 3), (5, 9), (5, 8), (4, 9), (1, 10), (1, 1), (10, 5),
    ]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {(r.x, r.y) for r in skyline2d_points(df, "x", "y").collect()}
    assert got == brute_skyline(set(pts))


def test_skyline_multibucket_exact(spark):
    # 40 distinct x values across a forced 8-bucket split: the
    # cross-bucket suffix max must make bucketing invisible
    pts = [(i, (i * 37) % 41) for i in range(40)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    for nparts in (1, 3, 8):
        got = {
            (r.x, r.y)
            for r in skyline2d_points(
                df, "x", "y", num_partitions=nparts
            ).collect()
        }
        assert got == brute_skyline(pts), f"num_partitions={nparts}"


def test_skyline_duplicate_points_all_survive(spark):
    df = spark.createDataFrame(
        [("a", 5, 5), ("b", 5, 5), ("c", 1, 1)], "id: string, x: long, y: long"
    )
    rows = skyline2d(df, "x", "y").collect()
    assert {r.id for r in rows} == {"a", "b"}


def test_skyline_grouped_independent_frontiers(spark):
    df = spark.createDataFrame(
        [
            ("g1", 10, 1), ("g1", 1, 10), ("g1", 5, 5),
            ("g2", 5, 5), ("g2", 6, 6),
        ],
        "g: string, x: long, y: long",
    )
    got = {
        (r.g, r.x, r.y)
        for r in skyline2d_points(df, "x", "y", ["g"]).collect()
    }
    # g1: (5,5) dominated by nothing? (10,1) no, (1,10) no — all 3 are
    # incomparable -> all survive; g2: only (6,6)
    assert got == {
        ("g1", 10, 1), ("g1", 1, 10), ("g1", 5, 5), ("g2", 6, 6)
    }


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, 0, 0, s), u, t, 0.0, "{}")
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    )


def test_transition_matrix_counts_and_probs(spark):
    # user 1: A B A ; user 2: B B -> A->B x1, B->A x1, B->B x1
    ev = _ev(
        spark,
        [(1, 0, "A"), (1, 1, "B"), (1, 2, "A"), (2, 0, "B"), (2, 1, "B")],
    )
    out = {
        (r.from_type, r.to_type): r for r in transition_matrix(ev).collect()
    }
    assert out[("A", "B")].n_transitions == 1
    assert out[("A", "B")].prob == 1.0
    assert out[("B", "A")].n_transitions == 1
    assert out[("B", "A")].prob == 0.5
    assert out[("B", "B")].prob == 0.5
    assert len(out) == 3


def test_transition_matrix_never_crosses_users(spark):
    ev = _ev(spark, [(1, 0, "A"), (2, 1, "B")])
    assert transition_matrix(ev).collect() == []


def test_transition_matrix_tie_broken_by_event_id(spark):
    # same timestamp: event_id order decides the sequence A -> B -> C
    ev = _ev(spark, [(1, 0, "A"), (1, 0, "B"), (1, 0, "C")])
    got = {
        (r.from_type, r.to_type) for r in transition_matrix(ev).collect()
    }
    assert got == {("A", "B"), ("B", "C")}


def test_session_paths_split_truncate_and_count(spark):
    # user 1: A,B at t=0,1s then (gap > 30min) C alone;
    # user 2: 7 events -> path truncated to first 5
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [(1, 0, "A"), (1, 1, "B"), (1, 4000, "C")] + [
        (2, i, t) for i, t in enumerate(["A", "B", "C", "D", "E", "F", "G"])
    ]
    ev = spark.createDataFrame(
        [
            (i, t0 + timedelta(seconds=s), u, t, 0.0, "{}")
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    from bigdataminingproject_spark.operators.events import session_paths

    out = {r.path: r.n_sessions for r in session_paths(ev).collect()}
    assert out == {"A>B": 1, "C": 1, "A>B>C>D>E": 1}


def test_session_paths_one_user_exchange(spark):
    # the in-session window and session aggregate must ride the
    # user_id partitioning (subset rule): no exchange keyed on
    # (user_id, session_seq) may appear
    from bigdataminingproject_spark.operators.events import session_paths

    ev = _ev(spark, [(1, 0, "A"), (1, 1, "B")])
    plan = session_paths(ev)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" in plan
    assert "hashpartitioning(user_id#" in plan
    import re

    assert not re.search(r"hashpartitioning\(user_id#\d+L, session_seq", plan)


def test_skyline_mixed_directions(spark):
    # maximize x, MINIMIZE y (e.g. spend vs latency): p dominates q iff
    # p.x >= q.x and p.y <= q.y with one strict
    pts = [(10, 8), (9, 2), (8, 1), (7, 1), (10, 9), (1, 1), (10, 1)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {
        (r.x, r.y)
        for r in skyline2d(df, "x", "y", y_dir="min").collect()
    }
    want = {
        p
        for p in set(pts)
        if not any(
            q[0] >= p[0] and q[1] <= p[1] and (q[0] > p[0] or q[1] < p[1])
            for q in pts
        )
    }
    assert got == want == {(10, 1)}


def test_skyline_min_min_directions(spark):
    pts = [(1, 5), (2, 2), (5, 1), (3, 3), (1, 5)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = sorted(
        (r.x, r.y)
        for r in skyline2d(df, "x", "y", x_dir="min", y_dir="min").collect()
    )
    # (1,5) duplicated and on the frontier -> both rows survive
    assert got == [(1, 5), (1, 5), (2, 2), (5, 1)]


def test_skyline_rejects_bad_direction(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 1)], "x: long, y: long")
    with _pytest.raises(ValueError):
        skyline2d(df, "x", "y", x_dir="up")


def brute_skyline_nd(points, dirs=None):
    d = len(points[0])
    dirs = dirs or ["max"] * d
    sgn = [1 if x == "max" else -1 for x in dirs]
    norm = [tuple(s * v for s, v in zip(sgn, p)) for p in points]
    out = set()
    for p, raw in zip(norm, points):
        dominated = any(
            all(q[i] >= p[i] for i in range(d))
            and any(q[i] > p[i] for i in range(d))
            for q in norm
        )
        if not dominated:
            out.add(raw)
    return out


def test_skyline_nd_matches_bruteforce_3d(spark):
    from bigdataminingproject_spark.operators.skyline import (
        skyline_nd_points,
    )

    pts = [
        (10, 1, 1), (10, 5, 2), (9, 6, 9), (8, 6, 3), (8, 2, 8),
        (7, 7, 7), (7, 7, 7), (6, 3, 10), (5, 9, 1), (5, 8, 5),
        (4, 9, 4), (1, 10, 2), (1, 1, 1), (10, 5, 2), (2, 2, 11),
        (3, 10, 6), (9, 9, 1), (1, 4, 11),
    ]
    df = spark.createDataFrame(pts, "x: long, y: long, z: long")
    got = {
        (r.x, r.y, r.z)
        for r in skyline_nd_points(df, ["x", "y", "z"]).collect()
    }
    assert got == brute_skyline_nd(pts)


def test_skyline_nd_min_direction_and_groups(spark):
    from bigdataminingproject_spark.operators.skyline import skyline_nd

    pts = [
        ("a", 10, 3, 5), ("a", 10, 3, 7), ("a", 9, 1, 5), ("a", 2, 9, 1),
        ("a", 5, 5, 5), ("b", 1, 1, 1), ("b", 2, 2, 2), ("b", 3, 1, 2),
    ]
    df = spark.createDataFrame(pts, "g: string, x: long, y: long, z: long")
    dirs = ["max", "min", "max"]
    got = {
        (r.g, r.x, r.y, r.z)
        for r in skyline_nd(
            df, ["x", "y", "z"], group_cols=["g"], dirs=dirs
        ).collect()
    }
    exp = set()
    for g in ("a", "b"):
        gp = [p[1:] for p in pts if p[0] == g]
        exp |= {(g, *p) for p in brute_skyline_nd(gp, dirs)}
    assert got == exp
    # duplicated frontier point: both copies survive the join-back
    assert ("a", 10, 3, 7) in got


def test_skyline_nd_local_phase_is_safe_across_partitions(spark):
    """Force many small partitions so the local-skyline phase sees
    fragments: phase-1 pruning must never drop a global frontier
    point (its guarantee is superset, not exactness)."""
    import random

    from bigdataminingproject_spark.operators.skyline import (
        skyline_nd_points,
    )

    rng = random.Random(7)
    pts = [
        (rng.randint(0, 50), rng.randint(0, 50), rng.randint(0, 50))
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        pts, "x: long, y: long, z: long"
    ).repartition(16)
    got = {
        (r.x, r.y, r.z)
        for r in skyline_nd_points(df, ["x", "y", "z"]).collect()
    }
    assert got == brute_skyline_nd(pts)


def test_markov_stationary_conserves_mass_and_finds_absorber(spark):
    """Power iteration must conserve probability mass (rows are
    10-dp-normalized, sinks self-loop) and drain mass toward an
    absorbing state: a -> b -> b-has-no-outgoing means b absorbs."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    from bigdataminingproject_spark.operators.events import (
        markov_stationary,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(10):
        for i, et in enumerate(["a", "a", "b"]):
            rows.append(
                (eid, t0 + dt.timedelta(seconds=eid), u, et)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    out = {r["event_type"]: r["stationary_p"] for r in markov_stationary(df).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-8
    # b never transitions out (sequences end at b) -> absorbing; after
    # 3 steps from uniform, b holds more mass than a
    assert out["b"] > out["a"]


def test_markov_stationary_uniform_cycle_stays_uniform(spark):
    """A deterministic 2-cycle a<->b from the uniform start is already
    stationary: both states keep 0.5."""
    import datetime as dt

    from bigdataminingproject_spark.operators.events import (
        markov_stationary,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(8):
        rows.append((i, t0 + dt.timedelta(seconds=i), 1, "ab"[i % 2]))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    out = {r["event_type"]: r["stationary_p"] for r in markov_stationary(df).collect()}
    assert out == {"a": 0.5, "b": 0.5}
