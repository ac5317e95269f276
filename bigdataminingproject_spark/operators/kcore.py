"""k-core (coreness) decomposition of the part co-purchase graph via
the distributed H-index iteration.

Coreness — the largest k such that a vertex survives in the k-core —
is the standard density measure for graph-shaped curation (dense
co-purchase communities, spam-cluster detection on token graphs). The
textbook algorithm is SEQUENTIAL peeling (remove the min-degree vertex,
repeat), which has no parallel shape at all. This module instead uses
the H-index fixpoint characterization (Lü, Zhou, Zhang, Stanley —
"The H-index of a network node and its relation to degree and
coreness", Nature Communications 7:10168, 2016): start every vertex at
its degree and repeatedly replace each vertex's value with the H-index
of its neighbors' values; the (monotonically non-increasing) sequence
converges to the coreness EXACTLY, and every round is one
embarrassingly-parallel pass over the edge list — joins, windows and
hash aggregations, no driver-side graph structure.

Spark iterates ADAPTIVELY to the fixpoint (round 8): every other
round it checks whether one more H-index pass moves any vertex and
stops at the first no-op — measured convergence is 21 rounds at
sf0.001, 10 at sf0.01, 5 at sf0.1, and >28 on the 100x replica's
335x-densified graph (the round-8 guard caught 171 vertices still
moving at the old fixed 28-round unroll — two engines agreeing on
pre-fixpoint values, the exact silent failure ADVICE r7 predicted).
``KCORE_ROUNDS`` is now the CAP, not the schedule: if the cap is hit
with vertices still moving, the operator raises loudly. The DuckDB
oracle unrolls exactly ``KCORE_ROUNDS`` rounds — extra rounds past the
fixpoint are no-ops (idempotence, pinned by pytest), so the adaptive
Spark result equals the fixed-unroll oracle whenever neither side
exceeds the cap, and the cap raise is symmetric by construction (same
integer arithmetic ⇒ same convergence round on both engines).

Graph: parts are vertices; an undirected edge connects two parts that
appear in >= MIN_CO_ORDERS distinct shared orders (the market-basket
graph of the Apriori operator, operators/association.py, with parts as
items and orders as baskets). The co-count floor bounds the graph at
catalog-adjacency size — corpus growth thickens edge weights, it does
not add quadratic structure (same argument as
graph.cooccurrence_edges).

Scale shape: the only corpus-sized stage is the basket dedup + pair
join that builds the edge list (prefix-bounded per order: C(items,2)
within an order, the association-rules shape). Every H-index round is
join + per-vertex window + hash-agg over the 2m-row symmetric edge
list — vocabulary-sized relations, shuffles bounded by the graph, not
the corpus. Determinism: the H-index is a rank statistic of an integer
multiset — no floats anywhere in the iteration.

No reference counterpart (the reference has no graph operators,
SURVEY.md §2); sibling of triangle_counts (operators/graph.py) and
token_pagerank (operators/frequency.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataminingproject_spark.sources.tables import load_table

KCORE_ROUNDS = 64  # CAP (and the oracle's unroll), not the schedule
MIN_CO_ORDERS = 2


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct undirected part-adjacency edges ``(a < b)`` for parts
    sharing >= MIN_CO_ORDERS distinct orders. Delegates the pair
    enumeration to the shared substrate
    (recommend.basket_pair_counts — one dedup shuffle, one
    within-order self-join, one pair hash-agg, the coincidence floor)
    and drops the count column the recommender keeps."""
    from bigdataminingproject_spark.operators.recommend import (
        basket_pair_counts,
    )

    return basket_pair_counts(
        lineitem, "l_orderkey", "l_partkey", MIN_CO_ORDERS
    ).select("a", "b")


def _hindex_round(sym: DataFrame, h: DataFrame) -> DataFrame:
    """One H-index pass: every vertex's value becomes the H-index of
    its neighbors' values (join + per-vertex rank window + hash-agg)."""
    w = Window.partitionBy("u").orderBy(F.desc("nh"), F.asc("nbv"))
    nb = sym.join(
        h.select(F.col("v").alias("nbv"), F.col("h").alias("nh")),
        F.col("v") == F.col("nbv"),
    ).select("u", "nbv", "nh")
    return (
        nb.withColumn("rn", F.row_number().over(w))
        .groupBy(F.col("u").alias("v"))
        .agg(
            F.coalesce(
                F.max(
                    F.when(F.col("nh") >= F.col("rn"), F.col("rn"))
                ),
                F.lit(0),
            ).alias("h")
        )
    )


def _moved_count(sym: DataFrame, h: DataFrame) -> tuple[DataFrame, int]:
    """Run one H-index round and count the vertices it moved. Returns
    (next_h checkpointed, moved) so the probe round is REUSED as a real
    round when it did move — a convergence check costs nothing extra
    until the round it confirms."""
    nxt = _hindex_round(sym, h).localCheckpoint(eager=True)
    moved = (
        nxt.join(h.select("v", F.col("h").alias("h_prev")), "v")
        .filter(F.col("h") != F.col("h_prev"))
        .count()
    )
    return nxt, moved


def coreness_hindex(
    edges: DataFrame,
    rounds: int = KCORE_ROUNDS,
    check_convergence: bool = True,
) -> DataFrame:
    """Coreness per vertex: H-index iterations from the degree start,
    run ADAPTIVELY to the fixpoint with ``rounds`` as a hard cap.
    Returns (v, coreness).

    Round 8 (ADVICE r7, upgraded): the previous design ran a FIXED
    28-round unroll pinned above the attested fixtures' convergence —
    and the publish-time guard added this round immediately caught the
    100x replica's densified graph still moving at 28 (both engines
    had been agreeing on pre-fixpoint values). Fixed unrolls don't
    survive scale growth, so Spark now probes convergence every other
    round (the probe round is reused as a real round — no wasted work)
    and stops at the first no-op; hitting the cap with vertices still
    moving raises loudly. The attested SFs converge in 5-21 rounds, so
    they got FASTER; the DuckDB oracle keeps a fixed ``rounds`` unroll
    and matches because extra rounds past the fixpoint are no-ops
    (idempotence, pytest-pinned), while a graph whose fixpoint exceeds
    the cap fails loudly on the Spark side before any comparison."""
    sym = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        .localCheckpoint(eager=True)
    )
    h = sym.groupBy(F.col("u").alias("v")).agg(
        F.count(F.lit(1)).alias("h")
    )
    converged = False
    r = 0
    while r < rounds:
        if check_convergence and (r % 2 == 1 or r == rounds - 1):
            h, moved = _moved_count(sym, h)
            r += 1
            if moved == 0:
                converged = True
                break
        else:
            h = _hindex_round(sym, h)
            r += 1
            if r % 2 == 0:  # cut the iterative lineage: without this
                # the unrolled plan's analysis cost dwarfs the data
                h = h.localCheckpoint(eager=True)
    if check_convergence and not converged:
        # cap exhausted (or rounds == 0): require the fixpoint anyway
        _, moved = _moved_count(sym, h)
        if moved:
            raise RuntimeError(
                f"coreness_hindex: {moved} vertices still moving after "
                f"{r} rounds (cap {rounds}) — this graph's fixpoint "
                "exceeds KCORE_ROUNDS; raise the cap (the oracle "
                "unrolls the same constant)"
            )
    return h.localCheckpoint(eager=True).select(
        F.col("v"), F.col("h").alias("coreness")
    )


def q_part_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness of every part in the co-purchase graph, densest
    first."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li).localCheckpoint(eager=True)
    return (
        coreness_hindex(edges)
        .select(
            F.col("v").alias("part_key"),
            F.col("coreness").cast("bigint").alias("coreness"),
        )
        .orderBy(F.desc("coreness"), "part_key")
    )


def coreness_oracle_sql(rounds: int = KCORE_ROUNDS) -> str:
    """DuckDB mirror: same edge build, the same H-index rounds unrolled
    as CTEs (generator beside the operator — the BPE / q-digest
    pattern)."""
    parts = [
        f"""
WITH li AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e AS (
    SELECT a.p AS a, b.p AS b
    FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
    HAVING COUNT(*) >= {MIN_CO_ORDERS}
),
sym AS MATERIALIZED (
    SELECT a AS u, b AS v FROM e
    UNION ALL
    SELECT b AS u, a AS v FROM e
),
h0 AS MATERIALIZED (SELECT u AS v, COUNT(*) AS h FROM sym GROUP BY u)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
h{r + 1} AS MATERIALIZED (
    SELECT u AS v,
           COALESCE(MAX(CASE WHEN nh >= rn THEN rn END), 0) AS h
    FROM (
        SELECT s.u, nb.h AS nh,
               row_number() OVER (
                   PARTITION BY s.u
                   ORDER BY nb.h DESC, nb.v ASC) AS rn
        FROM sym s JOIN h{r} nb ON s.v = nb.v
    )
    GROUP BY u
)"""
        )
    parts.append(
        f"""
SELECT v AS part_key, CAST(h AS BIGINT) AS coreness
FROM h{rounds}
ORDER BY coreness DESC, part_key"""
    )
    return "".join(parts)
