"""Frequency / top-k analytics (SURVEY.md §2.4: A2, A7-A9, A12-A13).

The reference bounds memory with a Count-Min Sketch + heap top-k
(frequency_detector.py); on Spark the exact ``groupBy(token).count()``
scales out, map-side-combines, and the top-k lands on
TakeOrderedAndProject — so exact-first, with ``df.stat.countMinSketch``
kept in the sketch parity layer (operators/sketches.py).

Token-multiset semantics are preserved: every occurrence counts, including
repeats within one document (A13, frequency_detector.py:36-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.functions.text import remove_stopwords, tokenize
from bigdataminingproject_spark.sources.tables import load_table


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact global token frequencies after reference preprocessing."""
    toks = remove_stopwords(tokenize(F.col(text_col)))
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
    )


def top_k_tokens(df: DataFrame, k: int = 10, text_col: str = "text") -> DataFrame:
    """Top-k tokens by frequency (A7/A8), deterministic tiebreak on token."""
    return token_counts(df, text_col).orderBy(
        F.desc("token_count"), "token"
    ).limit(k)


def estimate_batch(
    df: DataFrame, terms: list[str], text_col: str = "text"
) -> DataFrame:
    """Point/batch frequency query (A9, frequency_detector.py:89-93).

    Terms are lowercased at query time like the reference; unseen terms
    report 0 via a broadcast left join from the query-terms side.
    """
    spark = df.sparkSession
    want = spark.createDataFrame(
        [(t.lower(),) for t in terms], "term string"
    )
    counts = token_counts(df, text_col)
    return (
        F.broadcast(want)
        .join(counts, want.term == counts.token, "left")
        .select(
            "term",
            F.coalesce(F.col("token_count"), F.lit(0)).alias("estimate"),
        )
        .orderBy("term")
    )


def q_doc_tokens_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens across the documents corpus (reference A7 on docs)."""
    docs = load_table(spark, sf_dir, "documents")
    return top_k_tokens(docs, k=20)


def q_doc_term_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency point-queries incl. an unseen and an uppercase term (A9)."""
    docs = load_table(spark, sf_dir, "documents")
    return estimate_batch(docs, ["spark", "TABLE", "row", "zzz_unseen"])


def q_doc_source_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: top-5 tokens within each source (window rank, O5)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = remove_stopwords(tokenize(F.col("text")))
    counts = (
        docs.select("source", F.explode(toks).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("token_count"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("token_count"), "token")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "token", "token_count", "rnk")
        .orderBy("source", "rnk")
    )


def q_doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 token bigrams over cleaned text (T6 with k=2 on the
    stopword-filtered token stream)."""
    from bigdataminingproject_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        remove_stopwords(tokenize(F.col("text"))).alias("_toks")
    )
    return (
        tk.select(F.explode(shingles(F.col("_toks"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("bigram_count"))
        .orderBy(F.desc("bigram_count"), "bigram")
        .limit(15)
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (smoothed idf).

    score = tf * ln((N+1)/(df+1)), tf = in-doc occurrences after
    reference preprocessing, df = docs containing the term, N = corpus
    size. The classic salient-term extractor for corpus exploration /
    keyword labeling.

    Scale shape: explode -> hash-agg to (doc, term) tf [one shuffle],
    re-agg to term docfreq [second shuffle over the much smaller
    (doc,term) relation], join back on term (vocabulary-sized — Spark
    picks shuffle-hash/SMJ; never driver-side), 1-row N broadcast, then
    a per-doc rank window partitioned on doc_id. No global windows, no
    collect.

    Parity: tf/df/N are exact integers; the only float is the final
    ln(), rounded to 4 dp on BOTH engines BEFORE ranking, so rank order
    is a deterministic function of (rounded score, token) — a 1-ulp
    libm-vs-JVM log difference flips a rank only if a true score sits
    within ~1e-12 of a 0.00005 rounding boundary.
    """
    toks = remove_stopwords(tokenize(F.col(text_col)))
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n_docs") + F.lit(1.0))
                    / (F.col("df") + F.lit(1.0))
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "token", "tf", "df", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


def q_doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (corpus keyword extraction)."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, k=3)


def q_doc_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: token volume, exact distinct count,
    type-token ratio (A12 exact; the HLL variant lives in sketches.py)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = remove_stopwords(tokenize(F.col("text")))
    tok = docs.select(F.explode(toks).alias("token"))
    return tok.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.count_distinct("token").alias("distinct_tokens"),
        F.round(
            F.count_distinct("token") / F.count(F.lit(1)), 6
        ).alias("type_token_ratio"),
    )
