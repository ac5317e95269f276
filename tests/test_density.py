"""Grid-density clustering: multi-cluster separation, diagonal
adjacency, noise exclusion, singleton components, and the summary
aggregation — crafted fixtures, since the synthetic events corpus's
dense band is hour-uniform and forms one component.

No reference counterpart (north-star density-clustering family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.density import (
    grid_density_cells,
    grid_density_clusters,
)


def _df(spark, pts):
    return spark.createDataFrame(pts, "x double, y double")


def _cells(spark, pts, minpts=2):
    return grid_density_cells(
        _df(spark, pts), F.col("x"), F.col("y"), 1.0, 1.0, minpts=minpts
    ).collect()


def test_two_separated_blobs_two_clusters(spark):
    # blob A: cells (0,0),(0,1); blob B: cells (5,5),(5,6) — separated
    # by sparse space → two components with min-cell-id labels
    pts = []
    for cx, cy in ((0, 0), (0, 1), (5, 5), (5, 6)):
        pts += [(cx + 0.2, cy + 0.3), (cx + 0.7, cy + 0.6)]
    rows = _cells(spark, pts)
    by_cluster: dict[int, set[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["cell_id"])
    assert len(by_cluster) == 2
    assert by_cluster[0] == {0, 1}  # 0*1000+0, 0*1000+1
    assert by_cluster[5005] == {5005, 5006}


def test_diagonal_adjacency_merges(spark):
    # cells (0,0) and (1,1) touch only diagonally — 8-neighborhood
    # must merge them into one component
    pts = [(0.5, 0.5), (0.6, 0.4), (1.5, 1.5), (1.4, 1.6)]
    rows = _cells(spark, pts)
    assert {r["cluster_id"] for r in rows} == {0}
    assert {r["cell_id"] for r in rows} == {0, 1001}


def test_sparse_cells_are_noise(spark):
    # one dense cell + three single-point cells: only the dense cell
    # survives; the singletons never appear in the output
    pts = [(0.1, 0.1), (0.9, 0.9), (3.5, 3.5), (7.2, 1.1), (9.9, 9.9)]
    rows = _cells(spark, pts)
    assert len(rows) == 1
    assert rows[0]["cell_id"] == 0 and rows[0]["pts"] == 2


def test_singleton_dense_cell_labels_itself(spark):
    # a dense cell with no dense neighbors is its own cluster
    pts = [(0.1, 0.1), (0.5, 0.5), (4.2, 4.2), (4.8, 4.4)]
    rows = _cells(spark, pts)
    labels = {r["cell_id"]: r["cluster_id"] for r in rows}
    assert labels == {0: 0, 4004: 4004}


def test_summary_matches_cells(spark):
    pts = []
    for cx, cy in ((0, 0), (0, 1), (1, 1), (6, 2)):
        pts += [(cx + 0.2, cy + 0.3), (cx + 0.7, cy + 0.6), (cx + 0.4, cy + 0.9)]
    summary = {
        r["cluster_id"]: r
        for r in grid_density_clusters(
            _df(spark, pts), F.col("x"), F.col("y"), 1.0, 1.0, minpts=2
        ).collect()
    }
    assert set(summary) == {0, 6002}
    big = summary[0]
    assert big["n_cells"] == 3 and big["n_points"] == 9
    assert (big["min_x"], big["max_x"], big["min_y"], big["max_y"]) == (
        0,
        1,
        0,
        1,
    )
    assert summary[6002]["n_cells"] == 1
    assert summary[6002]["n_points"] == 3


def test_auto_minpts_is_half_mean_occupancy(spark):
    # 3 cells with 6/2/1 points: mean = 3, minpts = max(2, ceil(1.5)) = 2
    pts = (
        [(0.1 + i / 100, 0.1) for i in range(6)]
        + [(5.1, 5.1), (5.2, 5.2)]
        + [(9.5, 9.5)]
    )
    rows = _cells(spark, pts, minpts=None)
    assert {r["cell_id"]: r["pts"] for r in rows} == {0: 6, 5005: 2}


def test_fold_cell_partials_is_exact(spark):
    from bigdataminingproject_spark.operators.density import (
        fold_cell_partials,
    )

    parts = spark.createDataFrame(
        [(0, 0, 3), (0, 0, 2), (1, 1, 1), (1, 1, 4), (2, 0, 5)],
        "xi long, yi long, pts long",
    )
    got = {
        (r["xi"], r["yi"]): r["pts"]
        for r in fold_cell_partials(parts).collect()
    }
    assert got == {(0, 0): 5, (1, 1): 5, (2, 0): 5}


def test_stream_grid_twin_lands_on_batch(spark):
    from bigdataminingproject_spark.operators.density import (
        q_events_grid_clusters,
    )
    from bigdataminingproject_spark.streaming.pipeline import (
        q_stream_grid_maintenance,
    )

    sf_dir = "/root/testdata/sf0.001"
    batch = sorted(
        tuple(r) for r in q_events_grid_clusters(spark, sf_dir).collect()
    )
    live = sorted(
        tuple(r)
        for r in q_stream_grid_maintenance(spark, sf_dir).collect()
    )
    assert live == batch
