"""Graph analytics over the token co-occurrence graph.

The registry's iterative graph operator (token_pagerank,
operators/frequency.py) walks the co-occurrence graph; this module adds
the *combinatorial* graph family — triangle counting — with the
degree-oriented enumeration that makes it feasible at scale (Cohen
2009 / Suri & Vassilvitskii, WWW '11): orient every undirected edge
from its lower-(degree, id) endpoint to the higher one, enumerate
wedges only out of each node's ORIENTED neighbor list, and probe the
oriented edge set for the closing edge. Out-degrees under this
orientation are bounded by O(sqrt(m)) for any graph, so the wedge
relation is O(m^1.5) worst-case instead of sum(deg^2) — the difference
between a hub token generating deg^2 wedges and generating none.

Everything is DataFrame joins and hash aggregations (two self-joins on
node keys, one explode); no driver-side adjacency structure, no UDFs.
The reference has no graph operators at all (SURVEY.md §2) — this is
part of the corpus-analytics surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.functions.text import (
    remove_stopwords,
    shingles,
    tokenize,
)
from bigdataminingproject_spark.sources.tables import load_table


def cooccurrence_edges(
    docs: DataFrame, min_count: int = 2, text_col: str = "text"
) -> DataFrame:
    """Distinct undirected token-adjacency edges ``(a < b, c)`` with
    co-occurrence count >= ``min_count``.

    Same graph construction as token_pagerank: stopword-filtered
    tokens, adjacent pairs (2-shingles), self-loops dropped; the count
    floor prunes noise edges and bounds the graph at
    vocabulary-adjacency size — corpus growth thickens edge weights,
    it does not add quadratic structure.
    """
    toks = remove_stopwords(tokenize(F.col(text_col)))
    bg = docs.select(F.explode(shingles(toks, 2)).alias("bigram")).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    return (
        bg.filter(F.col("w1") != F.col("w2"))
        .select(
            F.least("w1", "w2").alias("a"),
            F.greatest("w1", "w2").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("a", "b")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts from a distinct
    undirected edge relation (columns ``a < b``).

    Plan: degree per node (one hash-agg over the doubled edge list),
    orient each edge low→high by (degree, node), wedge self-join on the
    oriented source, closing-edge equi-join — each triangle {u,v,w}
    is enumerated exactly once (from its lowest-ordered vertex), then
    exploded to credit all three corners. Returns (token, triangles).
    """
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(
        F.col("v").alias("a"), F.col("deg").alias("deg_a")
    )
    db = deg.select(
        F.col("v").alias("b"), F.col("deg").alias("deg_b")
    )
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias(
                "src"
            ),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias(
                "dst"
            ),
            F.when(lower_first, F.col("deg_b"))
            .otherwise(F.col("deg_a"))
            .alias("dst_deg"),
        )
    )
    # the wedge join reads the oriented relation twice and the closing
    # probe a third time — materialize it once (vocab-edge-sized)
    oriented = oriented.persist()
    e1 = oriented.select(
        F.col("src"),
        F.col("dst").alias("v"),
        F.col("dst_deg").alias("v_deg"),
    )
    e2 = oriented.select(
        F.col("src"),
        F.col("dst").alias("w"),
        F.col("dst_deg").alias("w_deg"),
    )
    wedges = e1.join(e2, "src").filter(
        (F.col("v_deg") < F.col("w_deg"))
        | ((F.col("v_deg") == F.col("w_deg")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"]).select(
        F.col("src").alias("u"), "v", "w"
    )
    return (
        tris.select(
            F.explode(F.array("u", "v", "w")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def q_token_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by triangle participation in the co-occurrence
    graph (min co-occurrence 2) — cluster-core tokens: high triangle
    count means the token's neighborhood is itself interconnected
    (topic kernel), where PageRank only measures reachability mass."""
    docs = load_table(spark, sf_dir, "documents")
    counts = triangle_counts(cooccurrence_edges(docs, min_count=2))
    top = counts.orderBy(F.desc("triangles"), F.asc("token")).limit(20)
    w = Window.orderBy(F.desc("triangles"), F.asc("token"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).orderBy("rank")


LPA_ROUNDS = 4  # fixed synchronous unroll, mirrored by the oracle


def label_propagation(
    edges: DataFrame, rounds: int = LPA_ROUNDS
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al., Phys. Rev. E '07) made DETERMINISTIC: every vertex starts
    labeled with itself; each round every vertex adopts the label most
    frequent among its neighbors, ties broken by smallest label. A
    fixed ``rounds`` unroll (not run-to-convergence — synchronous LPA
    can 2-cycle) keeps both engines on the identical update sequence.

    Per round: one edge-list join against the label relation, one
    (vertex, label) hash-agg, one per-vertex argmax window — all
    graph-sized, no driver state; lineage is cut per round. Returns
    (v, label) after the final round.
    """
    sym = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select("u")
        .distinct()
        .select(F.col("u").alias("v"), F.col("u").alias("label"))
    )
    w = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        nb = sym.join(
            labels.select(
                F.col("v").alias("nv"), F.col("label").alias("label")
            ),
            F.col("v") == F.col("nv"),
        ).select("u", "label")
        labels = (
            nb.groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("v"), "label")
            .localCheckpoint(eager=True)
        )
    return labels


def q_part_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part communities after 4 synchronous LPA rounds on the
    co-purchase graph (>= 2 shared orders): one row per community of
    size >= 2 — (community label, member count, smallest member)
    ordered by size. Basket-affinity clusters, the unsupervised
    complement of the coreness/clustering-coefficient family on the
    same graph. (The token co-occurrence graph is the wrong substrate
    here: at every attested SF it is a single dense 29-vertex clique
    cluster that LPA correctly collapses to one label.)"""
    from bigdataminingproject_spark.operators.kcore import (
        copurchase_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")
    labels = label_propagation(copurchase_edges(li))
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.min("v").alias("first_member"),
        )
        .filter(F.col("size") >= 2)
        .orderBy(F.desc("size"), "community")
    )


BFS_MAX_HOPS = 4  # hop cap, mirrored by the oracle's recursion guard
BFS_SEED_MOD = 50  # seeds = parts with p_partkey % BFS_SEED_MOD == 0


def seed_parts(part: DataFrame) -> DataFrame:
    """Deterministic, scale-proportional BFS seed set: every part whose
    key is a multiple of ``BFS_SEED_MOD`` (column ``v``). A key-modulus
    predicate (not a brand/name filter) so the seed fraction is stable
    across scale factors and synthetic replicas."""
    return part.filter(
        F.col("p_partkey") % BFS_SEED_MOD == 0
    ).select(F.col("p_partkey").alias("v"))


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int = BFS_MAX_HOPS
) -> DataFrame:
    """Multi-source BFS hop distances over a distinct undirected edge
    relation (columns ``a < b``): every vertex reachable from ``seeds``
    (column ``v``) within ``max_hops`` hops, as (v, hops) with hops =
    exact shortest unweighted distance (seeds at 0; unreachable /
    beyond-cap vertices absent; isolated seeds still emitted at 0).

    Plan: textbook frontier expansion (Pregel's BFS without Pregel) —
    per level ONE vertex-key equi-join of the frontier against the
    symmetrized edge list, a distinct, and an anti-join against the
    settled set; lineage cut per level, driver state = one boolean
    (``isEmpty`` early exit) — never rows. Each level's shuffle is
    bounded by the frontier's adjacency, and the settled relation is
    vertex-bounded, so the whole walk is graph-sized no matter the
    corpus SF behind the edge build. At cluster scale the symmetrized
    edge relation would be hash-partitioned on ``u`` once and every
    level's join co-locates with it.

    No reference counterpart (the reference has no graph surface,
    SURVEY.md §2) — graph-traversal member of the corpus-analytics
    family alongside triangles/LPA/coreness on the same substrate.
    """
    sym = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select("v", F.lit(0).alias("hops"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.select(F.col("v").alias("u"))
            .join(sym, "u")
            .select("v")
            .distinct()
            .join(dist, "v", "left_anti")
            .select("v", F.lit(h).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        # levels are disjoint by construction, so the settled set stays
        # a LAZY union of the checkpointed frontiers — each level's one
        # materialization is the frontier itself; the old per-level
        # eager re-checkpoint of the full settled relation paid one
        # extra vertex-bounded write per level for nothing (the union
        # is ≤ max_hops branches of already-materialized pieces)
        dist = dist.unionAll(nxt)
        frontier = nxt
    return dist


def _bfs_improvements(dist: DataFrame, cand: DataFrame) -> DataFrame:
    """Candidate (v, cand) rows that beat the settled distance in
    ``dist`` (v, hops) — min per vertex, then the strict-improvement
    filter (unreached counts as improved)."""
    return (
        cand.groupBy("v")
        .agg(F.min("cand").alias("cand"))
        .join(dist, "v", "left")
        .filter(F.col("hops").isNull() | (F.col("cand") < F.col("hops")))
        .select("v", F.col("cand").alias("hops"))
    )


def bfs_relax_inserts(
    dist: DataFrame,
    new_edges: DataFrame,
    edges: DataFrame,
    max_hops: int = BFS_MAX_HOPS,
) -> DataFrame:
    """Incremental BFS under edge INSERTS (insert-only Bellman-Ford):
    fold a batch of newly-appeared undirected edges (``a < b``) into a
    settled hop-distance relation ``dist`` (v, hops), returning the
    exact capped shortest distances over ``edges`` (the FULL current
    edge set, which must contain ``new_edges``).

    Rule: (a) relax across the new edges from settled endpoints, then
    (b) propagate improvements through the full edge relation until
    quiescent. ≤ ``max_hops`` propagation rounds is a theorem — the
    first changed vertex on any shortest path is adjacent to an
    UNCHANGED vertex via a NEW edge (an old-edge improvement from an
    unchanged neighbor would contradict the previous fixpoint), so it
    settles in step (a); hop values strictly increase along
    improvement chains and are capped — asserted, not assumed.

    Cost per batch tracks the delta's blast radius (newly-crossed
    edges + the vertices they improve), never state size: every round
    is a frontier-sized equi-join + vertex-bounded anti/left joins.
    """
    sym = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    nsym = new_edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(
        new_edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    du = dist.select(F.col("v").alias("u"), F.col("hops").alias("hu"))
    frontier = _bfs_improvements(
        dist,
        nsym.join(du, "u")
        .filter(F.col("hu") < max_hops)
        .select("v", (F.col("hu") + 1).alias("cand")),
    ).localCheckpoint(eager=True)
    for _ in range(max_hops):
        if frontier.isEmpty():
            break
        dist = (
            dist.join(frontier.select("v"), "v", "left_anti")
            .unionAll(frontier)
            .localCheckpoint(eager=True)
        )
        fu = frontier.select(
            F.col("v").alias("u"), F.col("hops").alias("hu")
        )
        frontier = _bfs_improvements(
            dist,
            sym.join(fu, "u")
            .filter(F.col("hu") < max_hops)
            .select("v", (F.col("hu") + 1).alias("cand")),
        ).localCheckpoint(eager=True)
    if not frontier.isEmpty():
        raise RuntimeError(
            "BFS delta relaxation failed to quiesce within "
            f"{max_hops} rounds"
        )
    return dist


def q_part_hop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hop distance of every part from the seed catalog slice
    (p_partkey % 50 == 0) in the co-purchase graph, capped at 4 hops —
    the graph-traversal complement of coreness/clustering/LPA on the
    same substrate: how many basket-affinity steps separate the
    catalog from a seed assortment (assortment-coverage analysis)."""
    from bigdataminingproject_spark.operators.kcore import (
        copurchase_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dist = bfs_hops(copurchase_edges(li), seed_parts(part))
    return dist.select(
        F.col("v").alias("part_key"),
        F.col("hops").cast("int").alias("hops"),
    ).orderBy("hops", "part_key")


def bfs_oracle_sql(
    max_hops: int = BFS_MAX_HOPS, seed_mod: int = BFS_SEED_MOD
) -> str:
    """DuckDB mirror of ``q_part_hop_distance``: identical edge build
    (the coreness oracle's CTE), seeds by the same key modulus, and a
    depth-capped recursive walk whose UNION dedupes (v, hops) rows —
    MIN(hops) per vertex afterwards is exactly the BFS level, because
    every path the frontier expansion explores appears in the walk
    relation at its own length. Generator-beside-the-operator pattern
    (kcore.coreness_oracle_sql)."""
    from bigdataminingproject_spark.operators.kcore import MIN_CO_ORDERS

    return f"""
WITH RECURSIVE li AS (
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
seeds AS (
    SELECT p_partkey AS v FROM part WHERE p_partkey % {seed_mod} = 0
),
walk(v, hops) AS (
    SELECT v, 0 FROM seeds
    UNION
    SELECT s.v, w.hops + 1
    FROM walk w JOIN sym s ON s.u = w.v
    WHERE w.hops < {max_hops}
)
SELECT v AS part_key, CAST(MIN(hops) AS INT) AS hops
FROM walk GROUP BY v
ORDER BY hops, part_key"""


PPR_DAMPING = 0.85
PPR_ITERS = 3
PPR_TOP_N = 20


def personalized_pagerank(
    weighted_edges: DataFrame,
    seeds: DataFrame,
    damping: float = PPR_DAMPING,
    iters: int = PPR_ITERS,
    top_n: int = PPR_TOP_N,
) -> DataFrame:
    """Personalized PageRank (Haveliwala, WWW '02) over an undirected
    weighted edge relation (``a < b, c``): the random walk teleports
    only to ``seeds`` (column ``v``), so rank mass measures WEIGHTED
    PROXIMITY to the seed set — the smooth complement of bfs_hops'
    discrete hop levels on the same substrate (a vertex two light hops
    away can out-rank one heavy hop away).

    Same engineering as token PageRank (frequency.py): symmetrized
    graph persisted once, per-iteration one join + hash-agg on dst,
    in-sums and rank values quantized at 10 dp so a DuckDB CTE chain
    replays the walk bit-for-bit; the teleport vector is the only
    difference — uniform over seeds-in-graph, zero elsewhere. Seeds
    not in the graph carry no mass (they have no edges to spread it
    through); the symmetric graph has no dangling vertices. N_seeds
    reaches the driver as one long.
    """
    spark = weighted_edges.sparkSession
    out_schema = "part_key bigint, ppr double, rank int"
    e = weighted_edges.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.col("c").cast("double").alias("w"),
    )
    edges = e.unionAll(
        e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    ).persist()
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w")).persist()
    seed1 = (
        seeds.select(F.col("v").alias("src"))
        .distinct()
        .withColumn("t", F.lit(1))
    )
    base = (
        outw.join(seed1, "src", "left")
        .select("src", F.coalesce("t", F.lit(0)).alias("t"))
        .persist()
    )
    ns = base.filter(F.col("t") == 1).count()  # ONE driver long
    if ns == 0:
        return spark.createDataFrame([], out_schema)
    nsd = F.lit(float(ns))
    pr = base.select(
        "src",
        F.round(
            F.when(F.col("t") == 1, F.lit(1.0) / nsd).otherwise(
                F.lit(0.0)
            ),
            10,
        ).alias("pr"),
    )
    tele = F.when(
        F.col("t") == 1, (F.lit(1.0) - F.lit(damping)) / nsd
    ).otherwise(F.lit(0.0))
    for _ in range(iters):
        contrib = (
            edges.join(pr, "src")
            .join(outw, "src")
            .groupBy("dst")
            .agg(
                F.round(
                    F.sum(F.col("pr") * F.col("w") / F.col("out_w")), 10
                ).alias("contrib")
            )
        )
        pr = (
            base.join(contrib, base["src"] == contrib["dst"], "left")
            .select(
                "src",
                F.round(
                    tele
                    + F.lit(damping)
                    * F.coalesce("contrib", F.lit(0.0)),
                    10,
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    top = pr.orderBy(F.desc("pr"), F.asc("src")).limit(top_n)
    w = Window.orderBy(F.desc("ppr"), F.asc("part_key"))
    return (
        top.select(F.col("src").alias("part_key"), F.col("pr").alias("ppr"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy("rank")
    )


def q_part_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by personalized PageRank around the seed catalog
    slice (p_partkey % 50 == 0) in the co-count-weighted co-purchase
    graph — weighted basket proximity, the ranking complement of
    q_part_hop_distance's levels."""
    from bigdataminingproject_spark.operators.kcore import (
        MIN_CO_ORDERS,
    )
    from bigdataminingproject_spark.operators.recommend import (
        basket_pair_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    wedges = basket_pair_counts(
        li, "l_orderkey", "l_partkey", MIN_CO_ORDERS
    )
    return personalized_pagerank(wedges, seed_parts(part))


def ppr_oracle_sql(
    damping: float = PPR_DAMPING,
    iters: int = PPR_ITERS,
    top_n: int = PPR_TOP_N,
    seed_mod: int = BFS_SEED_MOD,
) -> str:
    """DuckDB mirror of ``q_part_ppr``: the coreness oracle's weighted
    edge CTE, the seed-gated teleport, and one CTE block per iteration
    with the identical 10-dp quantization points (in-sum, then rank)."""
    from bigdataminingproject_spark.operators.kcore import MIN_CO_ORDERS

    blocks = [
        f"""
WITH li AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e AS (
    SELECT a.p AS a, b.p AS b, CAST(count(*) AS DOUBLE) AS c
    FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
    HAVING COUNT(*) >= {MIN_CO_ORDERS}
),
edges AS MATERIALIZED (
    SELECT a AS src, b AS dst, c AS w FROM e
    UNION ALL
    SELECT b AS src, a AS dst, c AS w FROM e
),
outw AS MATERIALIZED (
    SELECT src, sum(w) AS out_w FROM edges GROUP BY src
),
base AS MATERIALIZED (
    SELECT o.src,
           CASE WHEN o.src % {seed_mod} = 0 THEN 1 ELSE 0 END AS t
    FROM outw o
),
nsrow AS (SELECT CAST(sum(t) AS DOUBLE) AS ns FROM base),
pr0 AS (
    SELECT src,
           round(CASE WHEN t = 1 THEN 1.0 / ns ELSE 0.0 END, 10) AS pr
    FROM base, nsrow
)"""
    ]
    for t in range(1, iters + 1):
        blocks.append(
            f""",
pr{t} AS (
    SELECT b.src,
           round(CASE WHEN b.t = 1
                      THEN (1.0 - {damping}) / ns ELSE 0.0 END
                 + {damping} * coalesce(c.contrib, 0.0), 10) AS pr
    FROM base b
    CROSS JOIN nsrow
    LEFT JOIN (
        SELECT e.dst, round(sum(p.pr * e.w / ow.out_w), 10) AS contrib
        FROM edges e
        JOIN pr{t - 1} p ON p.src = e.src
        JOIN outw ow ON ow.src = e.src
        GROUP BY e.dst
    ) c ON c.dst = b.src
)"""
        )
    blocks.append(
        f"""
SELECT src AS part_key, pr AS ppr,
       CAST(row_number() OVER (ORDER BY pr DESC, src) AS INT) AS rank
FROM pr{iters}
ORDER BY pr DESC, src
LIMIT {top_n}"""
    )
    return "".join(blocks)


def q_part_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient of every part in the co-purchase
    graph: cc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) — how interconnected
    a part's co-purchase neighborhood is, the complement of coreness
    (operators/kcore.py): coreness measures depth of embedding,
    clustering measures neighborhood closure (basket-affinity
    communities vs popular-with-everything hubs).

    Reuses the degree-oriented triangle enumeration (O(m^1.5) wedges)
    and the Apriori-shaped edge build; everything after the edge list
    is graph-sized. Integer counts; the single division is pinned
    ((2.0 * tri) / (deg*(deg-1)), round 6) for cross-engine parity.
    """
    from bigdataminingproject_spark.operators.kcore import (
        copurchase_edges,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tc = triangle_counts(edges).select(
        F.col("token").alias("v"), "triangles"
    )
    tri = F.coalesce(F.col("triangles"), F.lit(0))
    return (
        deg.join(tc, "v", "left")
        .select(
            F.col("v").alias("part_key"),
            F.col("deg").cast("bigint").alias("deg"),
            tri.cast("bigint").alias("triangles"),
            F.when(F.col("deg") < 2, F.lit(0.0))
            .otherwise(
                F.round(
                    (F.lit(2.0) * tri)
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                )
            )
            .alias("cc"),
        )
        .orderBy(F.desc("cc"), "part_key")
    )
