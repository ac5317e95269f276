"""Grid-density clustering — the density-based clustering family
(DBSCAN's GriDBSCAN/grid-cell formulation: Ester et al. KDD'96 by way
of the cell-based O(n) approximation every distributed system ships,
e.g. ELKI's GriDBSCAN, Spark packages' DBSCAN-on-cells).

k-means (``kmeans_relational``) partitions EVERYTHING into k convex
blobs; density clustering answers a different question — where is the
data actually concentrated, and what is noise? The cell trick makes it
relational and shuffle-bounded: quantize points to grid cells, call a
cell DENSE when it holds >= minpts points, and define clusters as
8-neighborhood connected components of dense cells. Points in sparse
cells are noise. No pairwise distances anywhere — the only per-point
work is the quantization projection, and everything after the first
groupBy is CELL-sized, not corpus-sized.

Determinism contract (DuckDB oracle):

- cell coordinates are ``floor(x/wx)``/``floor(y/wy)`` — one IEEE
  division + floor, identical in both engines;
- ``minpts`` is COUNT-AWARE: max(2, ceil(total_points / (2 * occupied
  cells))) — half the mean occupancy, derived from the same two
  aggregates by both engines (the LSH/IVF/PQ auto-sizing pattern);
- cluster id = the smallest cell id (xi * 1000 + yi) reachable in the
  dense-cell adjacency graph; the oracle replays the closure with a
  recursive CTE, the operator with min-label propagation
  (``connected_components``) — different algorithms, identical labels.

Scale shape: one (xi, yi) hash-aggregate over the corpus; the dense
relation is grid-bounded; adjacency is an EQUI-join (each dense cell
explodes its 8 neighbor keys — no inequality join); CC runs on the
cell graph, not on points. At 100 TB the cell relation is the index,
exactly why the grid formulation (not pairwise DBSCAN) is the one that
distributes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.dedup import (
    connected_components,
)
from bigdataminingproject_spark.sources.tables import load_table

_CELL_Y_SPAN = 1000  # cell_id = xi * 1000 + yi; requires 0 <= yi < 1000


def fold_cell_partials(parts: DataFrame) -> DataFrame:
    """N-ary merge of (xi, yi, pts) cell-count partials: sum per cell —
    integer counters, the simplest mergeable state, and the LSM store's
    ``merge_transform`` for the streaming twin (every level stays
    occupied-grid-sized)."""
    return parts.groupBy("xi", "yi").agg(
        F.sum("pts").alias("pts")
    )


def label_dense_cells(
    cells: DataFrame, minpts: int | None = None
) -> DataFrame:
    """Dense-set cut + component labeling over a folded cell-count
    relation — the publish half of the grid pipeline, shared by the
    batch operator and the streaming maintenance twin."""
    if minpts is None:
        import math

        tot, occ = cells.agg(
            F.sum("pts").alias("t"), F.count(F.lit(1)).alias("o")
        ).collect()[0]
        # same IEEE division + ceil the SQL oracle computes
        minpts = max(2, math.ceil(int(tot) / (2.0 * int(occ))))
    dense = cells.filter(F.col("pts") >= minpts).withColumn(
        "cell_id", F.col("xi") * _CELL_Y_SPAN + F.col("yi")
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    probes = dense.select(
        F.col("cell_id").alias("cell_a"), "xi", "yi", F.explode(offsets).alias("o")
    ).select(
        "cell_a",
        (F.col("xi") + F.col("o.dx")).alias("nxi"),
        (F.col("yi") + F.col("o.dy")).alias("nyi"),
    )
    nb = dense.select(
        F.col("xi").alias("nxi"),
        F.col("yi").alias("nyi"),
        F.col("cell_id").alias("cell_b"),
    )
    edges = (
        probes.join(nb, ["nxi", "nyi"])
        .filter(F.col("cell_a") < F.col("cell_b"))
        .select("cell_a", "cell_b")
        .distinct()
    )
    cc = connected_components(edges, a_col="cell_a", b_col="cell_b").select(
        F.col("doc_id").alias("cell_id"), "cluster_id"
    )
    return (
        dense.join(cc, "cell_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "cell_id"))
        .select(
            "cluster_id",
            "cell_id",
            "xi",
            "yi",
            F.col("pts").cast("bigint").alias("pts"),
        )
        .orderBy("cluster_id", "cell_id")
    )


def grid_density_cells(
    df: DataFrame,
    x: Column,
    y: Column,
    wx: float,
    wy: float,
    minpts: int | None = None,
) -> DataFrame:
    """Labeled dense-cell relation: one row per dense cell with its
    component's cluster_id (smallest reachable cell id), coordinates
    and point count — the fine-grained output ``grid_density_clusters``
    summarizes."""
    cells = (
        df.select(
            F.floor(x / F.lit(wx)).alias("xi"),
            F.floor(y / F.lit(wy)).alias("yi"),
        )
        .groupBy("xi", "yi")
        .agg(F.count(F.lit(1)).alias("pts"))
    )
    return label_dense_cells(cells, minpts)


def grid_density_clusters(
    df: DataFrame,
    x: Column,
    y: Column,
    wx: float,
    wy: float,
    minpts: int | None = None,
) -> DataFrame:
    """Cluster report over the dense-cell components: one row per
    cluster with its cell count, point count, and cell-coordinate
    bounding box."""
    labeled = grid_density_cells(df, x, y, wx, wy, minpts)
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("pts").cast("bigint").alias("n_points"),
            F.min("xi").alias("min_x"),
            F.max("xi").alias("max_x"),
            F.min("yi").alias("min_y"),
            F.max("yi").alias("max_y"),
        )
        .orderBy("cluster_id")
    )


def q_events_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled dense cells of event activity over (hour-of-day,
    value-band): where in the daily cycle x spend spectrum the traffic
    concentrates, which bands are noise, and which component each
    dense cell belongs to. wx=1 hour band, wy=25 value units; minpts
    auto-derived (half mean occupancy). This corpus's dense band is
    hour-uniform so it forms one component — the multi-cluster
    separation semantics are pinned by crafted-fixture unit tests."""
    ev = load_table(spark, sf_dir, "events")
    return grid_density_cells(
        ev,
        x=F.hour("ts").cast("double"),
        y=F.col("value"),
        wx=1.0,
        wy=25.0,
    )
