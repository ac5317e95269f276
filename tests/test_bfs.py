"""Unit semantics for multi-source BFS hop distances
(operators/graph.py::bfs_hops) — hand-computed oracles on tiny graphs;
q_part_hop_distance carries the DuckDB gate (depth-capped recursive
CTE)."""

from __future__ import annotations

from bigdataminingproject_spark.operators.graph import (
    BFS_MAX_HOPS,
    bfs_hops,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def _seeds(spark, vs):
    return spark.createDataFrame([(v,) for v in vs], "v bigint")


def _dist(df):
    return {r["v"]: r["hops"] for r in df.collect()}


def test_path_graph_levels(spark):
    # 1-2-3-4-5-6 path, seed 1: hops = index-1, capped at 4 (6 absent)
    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    out = _dist(bfs_hops(path, _seeds(spark, [1])))
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_multi_source_takes_min(spark):
    # seeds at both ends of the path: middle meets at the min side
    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = _dist(bfs_hops(path, _seeds(spark, [1, 5])))
    assert out == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_disconnected_component_absent_isolated_seed_present(spark):
    g = _edges(spark, [(1, 2), (10, 11)])
    out = _dist(bfs_hops(g, _seeds(spark, [1, 99])))
    # 99 is isolated but a seed (hop 0); the 10-11 component unreachable
    assert out == {1: 0, 2: 1, 99: 0}


def test_cycle_does_not_inflate_distances(spark):
    # triangle + pendant: BFS must not revisit settled vertices
    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    out = _dist(bfs_hops(g, _seeds(spark, [1])))
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_hop_cap_respected(spark):
    long_path = _edges(spark, [(i, i + 1) for i in range(1, 10)])
    out = _dist(bfs_hops(long_path, _seeds(spark, [1]), max_hops=2))
    assert out == {1: 0, 2: 1, 3: 2}
    assert BFS_MAX_HOPS == 4  # oracle generator mirrors this constant


def test_seed_set_deduplicated(spark):
    g = _edges(spark, [(1, 2)])
    out = bfs_hops(g, _seeds(spark, [1, 1, 1]))
    assert out.count() == 2  # one row per vertex, not per seed copy


def test_delta_relaxation_matches_batch_under_any_arrival_order(spark):
    """The insert-only relaxation rule (bfs_relax_inserts — the
    streaming twin's per-batch step) must land on the exact batch BFS
    for every edge-arrival slicing, including batches that connect
    previously separate components and chains longer than one batch's
    new edges."""
    import random

    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.graph import (
        bfs_relax_inserts,
    )

    rnd = random.Random(17)
    n = 30
    all_edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rnd.randrange(n), rnd.randrange(n)) for _ in range(45)
            )
            if a != b
        }
    )
    seeds = _seeds(spark, [0, 7])
    batch = _dist(bfs_hops(_edges(spark, all_edges), seeds))

    rnd.shuffle(all_edges)
    dist = seeds.select("v", F.lit(0).alias("hops")).distinct()
    dist = dist.localCheckpoint(eager=True)
    have: list[tuple[int, int]] = []
    for i in range(0, len(all_edges), 9):  # 9-edge insert batches
        have.extend(all_edges[i : i + 9])
        new = _edges(spark, all_edges[i : i + 9])
        cur = _edges(spark, list(have))
        dist = bfs_relax_inserts(dist, new, cur)
    assert _dist(dist) == batch


def test_ppr_mass_conserved_and_seed_component_local(spark):
    """The symmetric graph has no dangling vertices, so walk mass is
    conserved (Σ ppr = 1 up to 10-dp rounding), and a component with
    no seed gets exactly zero — teleport never leaks across
    components. (Hop-monotone DECAY is deliberately not asserted:
    with damping 0.85 and 3 synchronous iterations, walk parity on a
    path ranks the seed's neighbor above the seed.)"""
    from bigdataminingproject_spark.operators.graph import (
        personalized_pagerank,
    )

    wedges = spark.createDataFrame(
        [(1, 2, 4), (2, 3, 4), (10, 11, 7)],
        "a bigint, b bigint, c bigint",
    )
    out = personalized_pagerank(wedges, _seeds(spark, [1]), top_n=10)
    rows = {r["part_key"]: r["ppr"] for r in out.collect()}
    assert rows[10] == 0.0 and rows[11] == 0.0
    assert rows[1] > 0 and rows[2] > 0 and rows[3] > 0
    assert abs(sum(rows.values()) - 1.0) < 1e-8


def test_ppr_weight_beats_hop_ties(spark):
    """Seed s with a heavy edge to x and a light edge to y: x must
    out-rank y even though both are one hop away."""
    from bigdataminingproject_spark.operators.graph import (
        personalized_pagerank,
    )

    wedges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1)], "a bigint, b bigint, c bigint"
    )
    out = personalized_pagerank(wedges, _seeds(spark, [1]), top_n=10)
    ranks = {r["part_key"]: r["rank"] for r in out.collect()}
    assert ranks[2] < ranks[3]


def test_ppr_no_seeds_in_graph_is_empty(spark):
    from bigdataminingproject_spark.operators.graph import (
        personalized_pagerank,
    )

    wedges = spark.createDataFrame(
        [(1, 2, 3)], "a bigint, b bigint, c bigint"
    )
    out = personalized_pagerank(wedges, _seeds(spark, [99]))
    assert out.count() == 0
