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
