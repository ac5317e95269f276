"""Text-analysis operators for a training-data pipeline (north-star set).

Language ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + word-regex), and document
fingerprinting. All pure column expressions — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import lit_array

from bigdataminingproject_spark.functions.text import (
    ENGLISH_STOPWORDS,
    tokenize,
)
from bigdataminingproject_spark.sources.tables import load_table

# Tiny per-language marker-word lists for the n-gram/stopword-hit language
# heuristic. Real pipelines would use fastText/CLD3; the heuristic keeps the
# whole operator inside codegen and is the documented public approach
# (stopword-profile language guessing).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "ich", "zu"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
}


def _marker_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    arr = lit_array(list(words))
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column, tokens: Column | None = None) -> Column:
    """Predicted language code by max marker-word hits (ties → 'en' first,
    then lexicographic); 'und' when nothing matches. Pass pre-materialized
    ``tokens`` to avoid per-language re-tokenization."""
    toks = tokenize(text) if tokens is None else tokens
    scored = F.array(
        *[
            F.struct(
                _marker_hits(toks, words).alias("hits"),
                F.lit(1 if lang == "en" else 0).alias("pref"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(text: Column, tokens: Column | None = None) -> dict[str, Column]:
    """Quality-scoring feature columns (length/punct/stopword/word stats).

    Pass a pre-materialized ``tokens`` column when selecting several
    features at once — the features reference the token array many times,
    and an inlined tokenizer would be re-evaluated per reference.
    """
    toks = tokenize(text) if tokens is None else tokens
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    stop_arr = lit_array(list(ENGLISH_STOPWORDS))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, "[\\p{Punct}]", "")
    )
    avg_token_len = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
        "stopword_ratio": F.round(
            F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)), 4
        ),
        "punct_ratio": F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 4
        ),
        "avg_token_len": F.round(avg_token_len, 4),
    }


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0,1]: heuristic blend of the features.

    Deterministic and monotone in the obvious directions: longer docs with
    a moderate stopword ratio and low punctuation score higher. Intended
    for threshold filtering of training corpora, not absolute meaning.
    """
    f = quality_features(text)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    stop_term = F.lit(1.0) - F.abs(f["stopword_ratio"] - F.lit(0.4))
    punct_term = F.lit(1.0) - F.least(f["punct_ratio"] * 4, F.lit(1.0))
    return F.round(
        (length_term + stop_term + punct_term) / F.lit(3.0), 4
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (rolling-hash analogue that's portable to any SQL oracle)."""
    return F.md5(F.array_join(tokenize(text), " "))


# --- query registry entries -------------------------------------------------

def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char/quality statistics."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", "text", tokenize(F.col("text")).alias("_toks")
    )
    f = quality_features(F.col("text"), tokens=F.col("_toks"))
    return tk.select(
        "doc_id",
        f["n_chars"].alias("num_chars"),
        f["n_tokens"].alias("num_tokens"),
        f["n_distinct_tokens"].alias("num_distinct_tokens"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["avg_token_len"].alias("avg_token_len"),
    ).orderBy("doc_id")


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document normalized fingerprint (exact-dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def q_doc_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition per labeled language (count, char stats)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("num_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID prediction counts vs the labeled language."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("lang", "text", tokenize(F.col("text")).alias("_toks"))
    return (
        tk.select(
            "lang",
            lang_id(F.col("text"), tokens=F.col("_toks")).alias(
                "predicted_lang"
            ),
        )
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("num_docs"))
        .orderBy("lang", "predicted_lang")
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score (threshold-filterable corpus signal)."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", "text", tokenize(F.col("text")).alias("_toks"))
    f = quality_features(F.col("text"), tokens=F.col("_toks"))
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    stop_term = F.lit(1.0) - F.abs(f["stopword_ratio"] - F.lit(0.4))
    punct_term = F.lit(1.0) - F.least(f["punct_ratio"] * 4, F.lit(1.0))
    return tk.select(
        "doc_id",
        F.round((length_term + stop_term + punct_term) / F.lit(3.0), 4).alias(
            "quality_score"
        ),
    ).orderBy("doc_id")


# GPT-2-style pretokenizer shape, restricted to RE2 syntax (no lookahead)
# so the same pattern runs in Spark's regex engine and the DuckDB oracle.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def rolling_fingerprint(tokens: Column, mod: int = 10**15, base: int = 31) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream
    (Rabin-Karp shape). Pure column fold — per-token 64-bit hashes reduced
    with modular arithmetic kept far from long overflow (ANSI-safe).
    Unlike the md5 fingerprint this is incremental/streamable state."""
    tok_h = lambda t: F.pmod(F.xxhash64(t), F.lit(10**9))  # noqa: E731
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(base) + tok_h(t), F.lit(mod)),
    )


def bpe_pair_stats(
    docs: DataFrame,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-weighted adjacent character-pair counts — the statistic
    the FIRST merge step of BPE tokenizer training maximizes (Sennrich
    et al. 2016: repeatedly merge the most frequent symbol pair).

    The count shape is the important part: pair frequency is computed
    over the (distinct word, corpus frequency) table, NOT by re-scanning
    every token occurrence — i.e. the corpus contributes ONE scan to
    build word counts (hash-agg with map-side combine), and all
    character-level work (pair extraction, weighting) runs on the
    vocabulary-sized relation. That ordering is what makes iterated BPE
    training tractable at 100 TB: the corpus is touched once, the merge
    loop touches only the vocabulary.

    Emits the top-``k`` pairs by weighted count with the number of
    distinct words containing each pair. All integers — no float parity
    surface at all.
    """
    from bigdataminingproject_spark.functions.text import tokenize

    words = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("word_freq"))
        .filter(F.length("word") >= 2)
    )
    # adjacent char pairs of each distinct word: substr positions
    # 1..len-1, 2 chars each (Column.substr takes Column args)
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.col("word").substr(i, F.lit(2)),
    )
    return (
        words.select(
            "word", "word_freq", F.explode(pairs).alias("pair")
        )
        .groupBy("pair")
        .agg(
            F.sum("word_freq").alias("pair_count"),
            F.count_distinct("word").alias("n_words"),
        )
        .orderBy(F.desc("pair_count"), "pair")
        .limit(k)
    )


def q_doc_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 BPE merge candidates (weighted adjacent char pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_stats(docs, k=30)


def q_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (north-star: whitespace + BPE-ish regex).

    ``ws_tokens`` = whitespace-delimited count; ``bpe_ish_tokens`` =
    matches of the GPT-2-style pretokenizer pattern — the token-budget
    proxy a training-data pipeline filters on.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(
        F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != F.lit(""))
    )
    bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0))
    )
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


def source_divergence(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source token-distribution drift vs the whole corpus: KL(P_s
    || Q) and Jensen-Shannon divergence — the monitoring signal that
    flags a crawl source whose content shifted between two pipeline
    runs (or an over-filtered stratum) before it skews the mixture.

    Every count relation re-aggregates from the single (source, token)
    hash-agg (AQE reuses its exchange; the corpus is scanned ONCE):
      c_sv -> per-source totals T_s, corpus counts c_v, corpus total T.
    The divergence grid is sources x vocabulary — independent of corpus
    row count — and each divergence is one hash-agg over that grid.
    P terms with c_sv = 0 contribute 0 to KL; the JSD mixture term is
    well-defined everywhere because q_v > 0 for every vocab entry.

    Parity: probabilities are ratios of exact longs (deterministic
    doubles); the ln-term sums are the only order-sensitive float
    reductions and are rounded at 6dp (the repo-wide quantization rule,
    same class as PMI / unigram-NLL).
    """
    from bigdataminingproject_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )

    toks = remove_stopwords(tokenize(F.col(text_col)))
    tk = docs.select(F.col(source_col).alias("source"), toks.alias("_t"))
    sc = (
        tk.select("source", F.explode("_t").alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c_sv"))
    )
    st = sc.groupBy("source").agg(F.sum("c_sv").alias("t_s"))
    cc = sc.groupBy("w").agg(F.sum("c_sv").alias("c_v"))
    tot = cc.agg(F.sum("c_v").alias("t"))
    grid = (
        st.crossJoin(F.broadcast(cc))
        .join(sc, ["source", "w"], "left")
        .crossJoin(F.broadcast(tot))
    )
    p = F.coalesce(F.col("c_sv"), F.lit(0)).cast("double") / F.col("t_s")
    q = F.col("c_v").cast("double") / F.col("t")
    kl_term = F.when(p > 0, p * F.log(p / q)).otherwise(F.lit(0.0))
    jsd_term = (
        F.lit(0.5)
        * F.when(p > 0, p * F.log(F.lit(2.0) * p / (p + q))).otherwise(
            F.lit(0.0)
        )
        + F.lit(0.5) * q * F.log(F.lit(2.0) * q / (p + q))
    )
    return (
        grid.groupBy("source")
        .agg(
            F.min("t_s").alias("n_tokens"),
            F.sum(
                F.when(F.col("c_sv").isNotNull(), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("vocab_size"),
            F.round(F.sum(kl_term), 6).alias("kl_vs_corpus"),
            F.round(F.sum(jsd_term), 6).alias("jsd_vs_corpus"),
        )
        .orderBy("source")
    )


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution KL / JSD of every source against the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return source_divergence(docs)
