"""Corpus data card: the per-source summary report a dataset release
ships with (Datasheets for Datasets, Gebru et al. 2021; every major
open corpus — C4, Pile, RefinedWeb, FineWeb — publishes this table).

Composes the engine's per-doc signals into one relation per source:
volume (docs, tokens), language spread (distinct langs + entropy of
the language distribution), and exact-duplicate pressure (docs minus
distinct text hashes). North-star composition — the reference has no
corpus-reporting surface (SURVEY.md §2.9).

Scale: TWO corpus scans, both ending in tiny per-source relations —
one through the (source, lang) aggregate (entropy falls out of the
sum/sum-n-ln-n identity, so no per-language join-back), one for the
distinct-hash count (count_distinct needs doc granularity). Every
subsequent join is on the #sources-sized key. No windows, no fanout.

Parity: counts are exact integers; entropy uses
H = ln(N) - (sum n_i ln n_i) / N over integer counts, rounded 4 dp —
the only float surface, same ln-ulp envelope as tfidf/bm25; the mean
uses the engine-stable half-up division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.numeric import stable_round_div
from bigdataminingproject_spark.functions.text import tokenize
from bigdataminingproject_spark.sources.tables import load_table


def corpus_datacard(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per source: volume, language spread, duplicate pressure."""
    base = docs.select(
        "source",
        F.col("lang"),
        F.size(tokenize(F.col(text_col))).cast("bigint").alias("_nt"),
        F.md5(F.col(text_col)).alias("_gk"),
    )
    by_lang = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_nt").alias("nt"),
    )
    per_source = by_lang.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
        F.sum(F.col("n") * F.log("n")).alias("_snln"),
    )
    entropy = F.round(
        F.log(F.col("n_docs")) - F.col("_snln") / F.col("n_docs"), 4
    )
    dups = base.groupBy("source").agg(
        (F.count(F.lit(1)) - F.count_distinct("_gk")).alias("dup_docs")
    )
    return (
        per_source.join(dups, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            entropy.alias("lang_entropy"),
            "dup_docs",
            stable_round_div(
                F.col("n_tokens").cast("double"), F.col("n_docs"), 2
            ).alias("mean_doc_tokens"),
        )
        .orderBy("source")
    )


def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-card table over the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus_datacard(docs)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: the change manifest an
    incremental pipeline consumes so only added/changed documents pay
    the downstream passes (dedup, scoring, embedding) on a re-crawl.

    One full-outer equi-join on the id key comparing 128-bit content
    hashes — unchanged docs (the overwhelming majority of a re-crawl)
    are dropped before the manifest ever shuffles again. Both sides
    hash-partition on the id; no windows, no fanout, two corpus scans
    total.

    Output: (doc_id, status in {added, removed, changed}, old_hash,
    new_hash), ordered by id.
    """
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("old_hash"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("new_hash"),
    )
    joined = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("doc_id", "status", "old_hash", "new_hash")
        .orderBy("doc_id")
    )


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff manifest between the corpus and a deterministically mutated
    re-crawl of it: docs % 17 == 0 disappear, docs % 10 == 0 change
    text, and every doc % 50 == 0 re-appears under a new id."""
    docs = load_table(spark, sf_dir, "documents")
    survived = docs.filter(F.col("doc_id") % 17 != 0)
    mutated = survived.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" updated"))
        ).otherwise(F.col("text")),
    )
    additions = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    new = mutated.unionByName(additions)
    return corpus_diff(docs, new)
