"""Hybrid retrieval: lexical BM25 + vector kNN fused with reciprocal
rank fusion (RRF, Cormack et al. SIGIR'09) — the default first-stage
retriever of a modern RAG / corpus-search stack, and the query-side QA
tool a training-data pipeline runs against its own chunk/embedding
index (north-star; the reference stops at frequency analytics,
SURVEY.md §2.9).

RRF(d) = sum over systems of 1 / (K + rank_sys(d)), K = 60. Rank — not
score — fusion is what makes the combination robust: BM25 and cosine
live on incomparable scales, and RRF never compares them directly.

Scale shape: both legs are already top-k-bounded operators (BM25's
TakeOrdered cut, kNN's broadcast-query rank window), so the fusion
itself runs on two k-row relations: a full outer join on doc_id plus
rank arithmetic — driver-scale work, zero additional corpus scans. At
100 TB the cost is exactly the cost of the two legs.

Parity: leg ranks are recomputed from the legs' ROUNDED sort keys
(bm25 4 dp, cosine 6 dp — each leg's own parity rule), so rank is a
deterministic function of attested values; the RRF score is a sum of
two exact-integer reciprocals, rounded to 6 dp before the final
(score desc, doc_id) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.operators.frequency import bm25_topk
from bigdataminingproject_spark.operators.similarity import knn_bruteforce
from bigdataminingproject_spark.sources.tables import load_table

RRF_K = 60


def rrf_fuse(
    ranked: dict[str, DataFrame],
    k: int = 10,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse any number of (id, rank) relations by reciprocal rank.

    Each input must carry ``id_col`` and a 1-based ``rank_col``. Output:
    id, per-system ranks (null where absent), fused ``rrf`` score,
    top-``k`` by (rrf desc, id).
    """
    legs = []
    for sys_name, df in sorted(ranked.items()):
        legs.append(
            df.select(
                F.col(id_col),
                F.col(rank_col).alias(f"rank_{sys_name}"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.join(leg, id_col, "full_outer")
    score = None
    for sys_name in sorted(ranked):
        contrib = F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"rank_{sys_name}")),
            F.lit(0.0),
        )
        score = contrib if score is None else score + contrib
    return (
        out.withColumn("rrf", F.round(score, 6))
        .orderBy(F.desc("rrf"), id_col)
        .limit(k)
    )


def hybrid_search(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    k_each: int = 20,
) -> DataFrame:
    """Top-``k`` documents for a (terms, query-vector) pair under RRF.

    The vector corpus joins the doc corpus 1:1 on vec_id == doc_id
    (the synthetic tables share the id space; a production index
    carries the mapping explicitly). ``k_each`` bounds each leg before
    fusion — the standard first-stage depth.
    """
    lex = bm25_topk(docs, query_terms, k=k_each).select("doc_id", "bm25")
    # rank over the k_each-row TakeOrdered output (bounded relation;
    # the single-partition window is over a reduced input by design)
    lex_ranked = lex.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id")),
    )
    queries = vectors.filter(F.col("vec_id") == query_vec_id)
    vec = knn_bruteforce(vectors, queries, k=k_each).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse({"lex": lex_ranked, "vec": vec}, k=k)


HYBRID_QUERY_TERMS = ["join", "vector", "stream"]
HYBRID_QUERY_VEC = 0


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF-fused lexical+vector top-10 for a fixed 3-term query and
    query vector 0."""
    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    return hybrid_search(
        docs, vecs, HYBRID_QUERY_TERMS, HYBRID_QUERY_VEC, k=10
    )


def hard_negatives(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k_lex: int = 20,
    n_neg: int = 5,
) -> DataFrame:
    """Hard-negative mining for dense-retriever training: documents the
    LEXICAL retriever ranks high but whose embedding sits far from the
    query vector — lexically plausible, semantically wrong, exactly the
    contrastive examples that teach an embedding model what BM25 can't
    distinguish (the BM25-negatives recipe of DPR, Karpukhin et al.
    2020, sharpened by the semantic-distance cut).

    Scale shape: the BM25 leg is TakeOrdered-bounded to ``k_lex`` rows
    before anything else happens, so the cosine scoring and the
    ascending-similarity rank window run on a fixed-size relation; the
    single-row query vector is broadcast. Cost at 100 TB = cost of the
    BM25 scan.
    """
    from bigdataminingproject_spark.operators.similarity import (
        _as_double,
        cosine,
    )

    lex = bm25_topk(docs, query_terms, k=k_lex).select("doc_id", "bm25")
    qv = vectors.filter(F.col("vec_id") == query_vec_id).select(
        _as_double(F.col("embedding")).alias("q_vec")
    )
    v = vectors.select(
        F.col("vec_id").alias("doc_id"),
        _as_double(F.col("embedding")).alias("vec"),
    )
    scored = (
        lex.join(v, "doc_id")
        .crossJoin(F.broadcast(qv))
        .filter(F.col("doc_id") != query_vec_id)
        .select(
            "doc_id",
            "bm25",
            F.round(cosine(F.col("vec"), F.col("q_vec")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    # rank over the k_lex-row bounded relation (single-partition window
    # over a reduced input by design, as in hybrid_search's lex leg)
    ranked = scored.withColumn(
        "neg_rank",
        F.row_number().over(Window.orderBy("cosine_sim", "doc_id")),
    )
    return ranked.filter(F.col("neg_rank") <= n_neg).orderBy("neg_rank")


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five hardest negatives (BM25-top-20, lowest cosine to query
    vector 0) for the fixed hybrid query."""
    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(
        docs, vecs, HYBRID_QUERY_TERMS, HYBRID_QUERY_VEC
    )


def build_inverted_index(
    docs: DataFrame, min_df: int = 2, top_postings: int = 5
) -> DataFrame:
    """Materialize the lexical index the BM25/hybrid retrievers assume:
    per token, document frequency, collection frequency, and the head
    of its posting list (top-``top_postings`` docs by tf desc, doc_id
    asc, rendered ``doc:tf,doc:tf,...``) — the build step a corpus
    search stack runs once per release (north-star; the reference's
    frequency analytics never materialize a queryable index).

    Scale shape: explode -> (token, doc_id) hash-agg -> ONE shuffle on
    token that both the rank window and the final aggregate reuse (the
    window's hash partitioning satisfies the groupBy, so Catalyst
    plans a single token Exchange — verified in the physical plan: no
    exchange between Window and the aggregates). df/cf need every
    (token, doc) row, so the window itself can't be truncated; the
    MEMORY bound is what matters, and it holds because collect_list
    only accumulates the rank<=``top_postings`` entries (the CASE
    yields null past the cut and collect_list skips nulls), keeping
    per-token agg state at ``top_postings`` structs regardless of df.
    A full posting-list materialization would instead write the whole
    (token, doc) relation partitioned by token prefix; this operator
    is the bounded, attestable head of that.

    Parity: counts are exact integers; the posting string is assembled
    in rank order (unique per token), so it is deterministic text.
    """
    from bigdataminingproject_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )

    toks = docs.select(
        "doc_id",
        F.explode(remove_stopwords(tokenize(F.col("text")))).alias("token"),
    )
    tf = toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("token").orderBy(F.desc("tf"), "doc_id")
    ranked = tf.withColumn("rk", F.row_number().over(w))
    entry = F.when(
        F.col("rk") <= top_postings,
        F.struct(
            F.col("rk"),
            F.concat_ws(":", F.col("doc_id"), F.col("tf")).alias("p"),
        ),
    )
    return (
        ranked.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(entry)), lambda x: x["p"]
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
        .orderBy(F.desc("df"), "token")
    )


def q_doc_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index manifest over the documents table (min_df=2,
    top-5 posting heads)."""
    return build_inverted_index(load_table(spark, sf_dir, "documents"))


def inverted_index_partial(
    docs: DataFrame, top_postings: int = 5
) -> DataFrame:
    """Mergeable partial of the inverted index: per token, df/cf plus
    the ranked posting HEAD as an array of (neg_tf, doc_id) structs
    (ascending struct order == tf desc, doc asc). See
    ``merge_inverted_index`` for why heads merge exactly."""
    from bigdataminingproject_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )

    toks = docs.select(
        "doc_id",
        F.explode(remove_stopwords(tokenize(F.col("text")))).alias("token"),
    )
    tf = toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("token").orderBy(F.desc("tf"), "doc_id")
    ranked = tf.withColumn("rk", F.row_number().over(w))
    entry = F.when(
        F.col("rk") <= top_postings,
        F.struct(
            (-F.col("tf")).alias("neg_tf"), F.col("doc_id").alias("doc_id")
        ),
    )
    return ranked.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.array_sort(F.collect_list(entry)).alias("heads"),
    )


def merge_inverted_index(
    a: DataFrame, b: DataFrame, top_postings: int = 5
) -> DataFrame:
    """Merge two disjoint-corpus index partials. df/cf add; the merged
    posting head is the top-``top_postings`` of the CONCATENATED heads
    — exact, not approximate, because every doc lives in exactly one
    partial, so any doc in the merged global top-k is in its own
    side's top-k (k-head closure under disjoint union). This is the
    index-maintenance twin of ``events.merge_hourly_rollup``: nightly
    delta builds merge into the snapshot without touching the full
    (token, doc) relation again."""
    empty = F.array().cast("array<struct<neg_tf:long,doc_id:bigint>>")
    aa = a.select(
        "token",
        F.col("df").alias("df_a"),
        F.col("cf").alias("cf_a"),
        F.col("heads").alias("h_a"),
    )
    bb = b.select(
        "token",
        F.col("df").alias("df_b"),
        F.col("cf").alias("cf_b"),
        F.col("heads").alias("h_b"),
    )
    return aa.join(bb, "token", "full_outer").select(
        "token",
        (
            F.coalesce("df_a", F.lit(0)) + F.coalesce("df_b", F.lit(0))
        ).alias("df"),
        (
            F.coalesce("cf_a", F.lit(0)) + F.coalesce("cf_b", F.lit(0))
        ).alias("cf"),
        F.slice(
            F.array_sort(
                F.concat(
                    F.coalesce(F.col("h_a"), empty),
                    F.coalesce(F.col("h_b"), empty),
                )
            ),
            1,
            top_postings,
        ).alias("heads"),
    )


def fold_index_partials(
    parts: DataFrame, top_postings: int = 5
) -> DataFrame:
    """N-ary ``merge_inverted_index``: fold any number of disjoint-
    corpus partials stacked as rows into one partial with a single
    aggregate — df/cf sum; the merged head is the top-``top_postings``
    of the flattened heads (exact by the same k-head-closure argument,
    applied recursively: a head that is top-k of its sub-corpus stays
    sufficient for the union's top-k). Associative and commutative, so
    it doubles as the state store's ``merge_transform``: LSM compaction
    folds partial-aggregate parts instead of stacking raw rows, keeping
    every level vocabulary-sized (streaming/statestore.py)."""
    return parts.groupBy("token").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.slice(
            F.array_sort(F.flatten(F.collect_list("heads"))),
            1,
            top_postings,
        ).alias("heads"),
    )


def finish_inverted_index(partial: DataFrame, min_df: int = 2) -> DataFrame:
    """Presentation pass: render heads as the ``doc:tf,...`` posting
    string and apply the min_df cut — same output contract as
    ``build_inverted_index``."""
    return (
        partial.filter(F.col("df") >= min_df)
        .select(
            "token",
            "df",
            "cf",
            F.array_join(
                F.transform(
                    F.col("heads"),
                    lambda x: F.concat_ws(
                        ":",
                        x["doc_id"].cast("string"),
                        (-x["neg_tf"]).cast("string"),
                    ),
                ),
                ",",
            ).alias("postings"),
        )
        .orderBy(F.desc("df"), "token")
    )


def q_doc_inverted_index_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental twin of q_doc_inverted_index: index 80% of the
    corpus as the snapshot, the other 20% as a delta build, merge, and
    finish — must land exactly on the full rebuild (same oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    snapshot = inverted_index_partial(docs.filter(F.col("doc_id") % 5 != 0))
    delta = inverted_index_partial(docs.filter(F.col("doc_id") % 5 == 0))
    return finish_inverted_index(merge_inverted_index(snapshot, delta))


def mmr_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from each query's top-``pool`` cosine candidates, pick
    ``k`` results greedily maximizing ``lam * relevance - (1 - lam) *
    max-similarity-to-already-selected`` — the diversity-aware final
    stage of a RAG retrieval stack (kNN finds near-duplicates of the
    same passage; MMR spends the k result slots on distinct content).

    Fully relational, no UDF loop: the greedy recurrence is UNROLLED
    into ``k`` DataFrame stages — each joins the bounded remaining-
    candidate relation (<= queries x pool rows) to the per-candidate
    max-similarity-over-selected aggregate and rank-picks one winner
    per query. All relations are candidate-pool-sized, never
    corpus-sized; at 100 TB the pool comes from the ANN path
    (ivf_knn_det / LSH) instead of brute force and everything after
    the pool is unchanged. Scores quantize half-up at 6 dp with the
    id tiebreak, so the DuckDB oracle (same unrolled stages) matches
    row-for-row.

    Lineage control: stage t's plan references every earlier stage, so
    the naive lazy composition grows EXPONENTIALLY in k (measured 18 s
    for a pool-bounded workload). The pool, the pairwise sims, and
    each stage's one-row-per-query pick are therefore
    ``localCheckpoint``ed — the standard iterative-algorithm lineage
    cut (k-means/GraphFrames do the same); data stays distributed,
    nothing is collected to the driver.
    """
    from bigdataminingproject_spark.operators.similarity import (
        _as_double,
        cosine,
    )

    cand = knn_bruteforce(
        vectors, queries, k=pool, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id", F.col("cosine_sim").alias("rel"))\
        .localCheckpoint(eager=True)
    v = vectors.select(
        F.col(id_col).alias("_vid"), _as_double(F.col(vec_col)).alias("_vec")
    )
    ca = cand.select("query_id", F.col("neighbor_id").alias("id_a")).join(
        v.select(F.col("_vid").alias("id_a"), F.col("_vec").alias("vec_a")),
        "id_a",
    )
    cb = cand.select("query_id", F.col("neighbor_id").alias("id_b")).join(
        v.select(F.col("_vid").alias("id_b"), F.col("_vec").alias("vec_b")),
        "id_b",
    )
    sims = (
        ca.join(cb, "query_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "query_id",
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias(
                "sim"
            ),
        )
    .localCheckpoint(eager=True)
    )
    pick_w = Window.partitionBy("query_id").orderBy(
        F.desc("mmr_score"), F.asc("neighbor_id")
    )
    sel = (
        cand.withColumn("mmr_score", F.col("rel"))
        .withColumn("rn", F.row_number().over(pick_w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "neighbor_id",
            "mmr_score",
            F.lit(1).alias("mmr_rank"),
        )
    )
    chosen = sel.select("query_id", "neighbor_id")
    for t in range(2, k + 1):
        maxsim = (
            sims.join(
                chosen.withColumnRenamed("neighbor_id", "id_b"),
                ["query_id", "id_b"],
            )
            .groupBy("query_id", F.col("id_a").alias("neighbor_id"))
            .agg(F.max("sim").alias("_maxsim"))
        )
        stage = (
            cand.join(chosen, ["query_id", "neighbor_id"], "left_anti")
            .join(maxsim, ["query_id", "neighbor_id"])
            .withColumn(
                "mmr_score",
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("_maxsim"),
                    6,
                )
                + F.lit(0.0),  # never emit -0.0 (oracle hash parity)
            )
            .withColumn("rn", F.row_number().over(pick_w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                "mmr_score",
                F.lit(t).alias("mmr_rank"),
            )
        .localCheckpoint(eager=True)
        )
        sel = sel.unionByName(stage)
        chosen = sel.select("query_id", "neighbor_id")
    return sel.select(
        "query_id", "mmr_rank", "neighbor_id", "mmr_score"
    ).orderBy("query_id", "mmr_rank")


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 from each of the first 3 query vectors'
    top-20 cosine pool (lambda = 0.7)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 3)
    return mmr_rerank(vecs, queries, k=5, pool=20, lam=0.7)
