"""k-core / coreness decomposition: H-index iteration vs the classic
sequential peeling (third implementation), fixed-round convergence on
real testdata, edge-build semantics, and the pair-counter fold
contract used by the streaming twin.

No reference counterpart (the reference has no graph operators,
SURVEY.md §2).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.kcore import (
    KCORE_ROUNDS,
    MIN_CO_ORDERS,
    copurchase_edges,
    coreness_hindex,
    coreness_oracle_sql,
)


def _peel_coreness(edges: list[tuple]) -> dict:
    """Third implementation: the classic sequential min-degree peeling
    (Batagelj-Zaversnik) the H-index fixpoint must reproduce."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    cur = {v: set(nb) for v, nb in adj.items()}
    k = 0
    while cur:
        k += 1
        while True:
            drop = [v for v, nb in cur.items() if len(nb) < k]
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
                for u in cur[v]:
                    cur[u].discard(v)
                del cur[v]
    return core


# a graph with three distinct coreness levels: a 4-clique (coreness 3),
# a triangle hanging off it (2), and pendant vertices (1)
CRAFTED = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
    (4, 5), (5, 6), (6, 4),  # triangle sharing vertex 4
    (6, 7), (7, 8),  # pendant path
]


def test_hindex_matches_peeling_on_crafted_graph(spark):
    df = spark.createDataFrame(CRAFTED, "a bigint, b bigint")
    got = {
        r["v"]: r["coreness"]
        for r in coreness_hindex(df, rounds=10).collect()
    }
    assert got == _peel_coreness(CRAFTED)
    assert got[1] == 3 and got[5] == 2 and got[8] == 1


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_fixed_rounds_reach_the_fixpoint(sf_dir):
    """KCORE_ROUNDS is pinned above measured convergence: one extra
    round changes nothing (checked on the cheap engine — both engines
    run the identical arithmetic)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS "
        f"SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    at = con.sql(coreness_oracle_sql(KCORE_ROUNDS)).fetchall()
    plus1 = con.sql(coreness_oracle_sql(KCORE_ROUNDS + 1)).fetchall()
    assert at == plus1


def test_convergence_guard_fires_below_fixpoint(spark):
    """The publish-time guard (ADVICE r7): an under-iterated run must
    raise loudly instead of publishing pre-fixpoint coreness. rounds=0
    publishes raw degrees, which differ from coreness on CRAFTED
    (vertex 4: degree 5, coreness 3)."""
    df = spark.createDataFrame(CRAFTED, "a bigint, b bigint")
    with pytest.raises(RuntimeError, match="still moving"):
        coreness_hindex(df, rounds=0).collect()
    # and the guard is a no-op at the fixpoint
    got = coreness_hindex(df, rounds=10, check_convergence=True)
    assert got.count() == 8


def test_edge_build_counts_distinct_orders(spark):
    # part 10 and 11 share two orders -> edge; 10 and 12 share one ->
    # pruned by MIN_CO_ORDERS; duplicate lineitems collapse
    rows = [
        (1, 10), (1, 11), (1, 12), (1, 10),
        (2, 10), (2, 11),
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    )
    got = {
        (r["a"], r["b"]) for r in copurchase_edges(li).collect()
    }
    assert MIN_CO_ORDERS == 2
    assert got == {(10, 11)}


def test_pair_counter_fold_is_exact(spark):
    """Counter additivity across order-disjoint batches — the
    streaming twin's state contract."""
    rows = [(o, p) for o in range(1, 9) for p in (10, 11, 12 + o % 2)]
    li = spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    )
    whole = {
        (r["a"], r["b"])
        for r in copurchase_edges(li).collect()
    }

    def batch_pairs(df):
        b = df.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
        return (
            b.select("o", F.col("p").alias("a"))
            .join(b.select("o", F.col("p").alias("b")), "o")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    lo = batch_pairs(li.filter(F.col("l_orderkey") <= 4))
    hi = batch_pairs(li.filter(F.col("l_orderkey") > 4))
    folded = {
        (r["a"], r["b"])
        for r in lo.unionByName(hi)
        .groupBy("a", "b")
        .agg(F.sum("c").alias("c"))
        .filter(F.col("c") >= MIN_CO_ORDERS)
        .collect()
    }
    assert folded == whole


def test_clustering_coefficient_on_crafted_graph(spark):
    """cc is exact on a hand-checkable graph: in K4 every vertex closes
    completely (cc=1); vertex 4 (K4 + triangle) has 5 neighbors, 4
    closed pairs of 10; pendant vertices have cc=0."""
    from bigdataminingproject_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(CRAFTED, "a bigint, b bigint")
    deg = {}
    for a, b in CRAFTED:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tri = {
        r["token"]: r["triangles"]
        for r in triangle_counts(df).collect()
    }
    def cc(v):
        d, t = deg[v], tri.get(v, 0)
        return 0.0 if d < 2 else round(2.0 * t / (d * (d - 1)), 6)
    assert cc(1) == 1.0 and cc(2) == 1.0  # K4 interior
    assert cc(4) == round(4 / 10, 6)  # deg 5, triangles 4
    assert cc(5) == 1.0  # triangle vertex: 1 closed pair of 1
    assert cc(8) == 0.0  # pendant
