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
