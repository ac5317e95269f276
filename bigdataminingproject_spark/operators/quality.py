"""Training-corpus quality signals beyond ``textstats.py``: repetition
metrics, PII redaction, and benchmark decontamination (north-star — the
reference has no corpus-curation surface; SURVEY.md §2.9).

These are the filters a large-scale LLM-data pipeline runs between raw
ingest and tokenization:

- **Repetition** (Gopher-style): duplicate-token fraction, most-common
  unigram/bigram mass. High values mark boilerplate, keyword stuffing,
  and generation loops.
- **PII redaction**: regex scrub of emails / phone numbers / IPv4
  addresses with per-doc match counts — pure ``regexp_replace`` /
  ``regexp_count`` column expressions, no UDFs.
- **Decontamination**: drop training docs sharing any 8-token shingle
  with a benchmark set (the standard n-gram-overlap test-set leak
  check).

Scale notes (100 TB):

- ``repetition_signals`` is one corpus scan per n-gram order; the
  explode fans out to ~n_tokens rows keyed by (doc_id, gram), so the
  count shuffle partitions on the doc axis — no hot keys, no global
  state. Map-side partial aggregation absorbs most of the fanout.
- ``pii_redact`` is a pure projection: zero shuffles, whole-stage
  codegen, trivially parallel.
- ``decontaminate`` builds the benchmark shingle set once — benchmark
  suites are small and bounded by construction, so it broadcasts; the
  corpus side is ONE scan + explode + broadcast semi join. No shuffle
  of corpus data at all.

Float-parity: ratio outputs are quantized to integer basis points
(``round(10000*a/b)`` → BIGINT). Round-to-integer is immune to the
Spark/DuckDB decimal-midpoint divergence that 2dp/4dp rounding of
arbitrary ratios hits (midpoint integers are exactly representable
doubles, so both engines see the same value and round it the same
way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import lit_array
from pyspark.sql.window import Window

from bigdataminingproject_spark.functions.text import shingles, tokenize
from bigdataminingproject_spark.sources.tables import load_table

# Simple ASCII patterns valid in both Java regex (Spark) and RE2
# (DuckDB) — keep them dialect-neutral.
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
PHONE_RE = "\\+1-555-[0-9]{4}"
IPV4_RE = "10\\.[0-9]{1,3}\\.0\\.[0-9]{1,3}"

DECONTAM_K = 8  # n-gram order for benchmark-overlap checks


def _bp(num: Column, den: Column) -> Column:
    """Integer basis points: round(10000*num/den) as BIGINT (see module
    docstring for why not round(x, 4))."""
    return F.round(F.lit(10000.0) * num / den).cast("bigint")


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-doc repetition metrics over raw tokens: token count, distinct
    fraction, top-unigram mass, top-bigram mass (all fractions in
    integer basis points).

    Two explode + two-level-aggregation branches (unigram, bigram)
    joined on doc_id. The shuffles are keyed by (doc_id, gram) —
    skew-free by construction (key cardinality grows with the corpus)
    and mostly absorbed by map-side partial aggregation.

    A shuffle-free alternative was implemented and MEASURED SLOWER:
    the most-frequent-gram count equals the longest equal-run in the
    sorted gram array, expressible as an ``F.aggregate`` fold — but
    Spark evaluates higher-order-function lambdas interpreted, outside
    whole-stage codegen, and the per-element struct fold cost more
    than the shuffle it saved (10x-corpus probe: 2.59s vs 1.90s for
    this version). Explode + hash aggregation stays.

    The token projection is materialized in its own select first:
    Catalyst does not CSE subexpressions, so inlining ``tokenize``
    into both branches would re-run the regex split per reference.
    """
    toks = docs.select("doc_id", tokenize("text").alias("toks"))
    uni = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("count").alias("top_uni"),
        )
    )
    bigrams = toks.select(
        "doc_id",
        # greatest(..., 0): slice() raises on negative length, which a
        # zero-token (empty-text) document would otherwise produce
        F.expr(
            "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
            "         slice(toks, 2, greatest(size(toks) - 1, 0)),"
            "         (a, b) -> concat(a, ' ', b))"
        ).alias("bgs"),
    )
    bi = (
        bigrams.select("doc_id", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("n_bigrams"), F.max("count").alias("top_bi"))
    )
    return (
        uni.join(bi, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            _bp(F.col("n_distinct"), F.col("n_tokens")).alias("distinct_bp"),
            _bp(F.col("top_uni"), F.col("n_tokens")).alias("top_unigram_bp"),
            _bp(F.col("top_bi"), F.col("n_bigrams")).alias("top_bigram_bp"),
        )
        .orderBy("doc_id")
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append redaction columns: ``<col>_redacted`` plus per-pattern
    match counts. Email → ``<EMAIL>``, phone → ``<PHONE>``,
    IPv4 → ``<IP>``. Pure column expressions — zero shuffles."""
    c = F.col(text_col)
    red = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    return df.withColumns(
        {
            "n_email": F.regexp_count(c, F.lit(EMAIL_RE)),
            "n_phone": F.regexp_count(c, F.lit(PHONE_RE)),
            "n_ip": F.regexp_count(c, F.lit(IPV4_RE)),
            f"{text_col}_redacted": red,
        }
    )


def doc_shingles(docs: DataFrame, k: int = DECONTAM_K) -> DataFrame:
    """Distinct word-k-gram shingles per doc: (doc_id, sh). Built on
    the engine-wide ``functions.text.shingles`` primitive (same one the
    dedup family and ``dedup.benchmark_contamination`` use)."""
    toks = docs.select("doc_id", tokenize("text").alias("toks"))
    return toks.select(
        "doc_id", F.explode(shingles(F.col("toks"), k)).alias("sh")
    ).distinct()


def decontaminate(
    docs: DataFrame, bench: DataFrame, k: int = DECONTAM_K
) -> DataFrame:
    """Flag training docs sharing any k-token shingle with the benchmark
    set. Returns (doc_id, contaminated).

    The train-doc-side view of benchmark overlap — the complementary
    bench-doc-side report (which corpus docs hit each benchmark doc)
    is ``dedup.benchmark_contamination``; both ride the same
    ``functions.text.shingles`` primitive. The benchmark shingle set is
    broadcast (benchmark suites are bounded); the corpus side never
    shuffles.
    """
    bench_sh = F.broadcast(
        doc_shingles(bench, k).select("sh").distinct()
    )
    hit = (
        doc_shingles(docs, k)
        .join(bench_sh, "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    return docs.select("doc_id").join(hit, "doc_id", "left").select(
        "doc_id", F.coalesce("contaminated", F.lit(0)).alias("contaminated")
    )


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics for every document (basis-point integers)."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_signals(docs)


def synthetic_pii_text(
    text: Column | str = "text", id_col: Column | str = "doc_id"
) -> Column:
    """Deterministic synthetic-PII augmentation: append an email, a
    phone number, and an IPv4 derived from the doc id. The test corpus
    contains no real PII, which would make any redaction check vacuous —
    the drills (q_doc_pii_redact, q_corpus_curation_v3) redact this
    augmented text instead, so the regex parity is exercised for real."""
    did = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(
        F.col(text) if isinstance(text, str) else text,
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@mail"),
        (did % 7).cast("string"),
        F.lit(".com tel +1-555-"),
        F.lpad(((did * 37) % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (did % 256).cast("string"),
        F.lit(".0."),
        ((did * 3) % 256).cast("string"),
    )


def q_doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction drill: augment each doc with deterministic
    synthetic PII (derived from doc_id — the corpus itself contains
    none, which would make the check vacuous), redact, and emit match
    counts plus an md5 attest of the redacted text."""
    docs = load_table(spark, sf_dir, "documents")
    aug = synthetic_pii_text()
    return (
        pii_redact(docs.select("doc_id", aug.alias("text")), "text")
        .select(
            "doc_id",
            "n_email",
            "n_phone",
            "n_ip",
            F.md5("text_redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap contamination rate per source. The synthetic
    benchmark set is every 25th doc. The drill runs at k=4 (production
    default is ``DECONTAM_K=8``): the synthetic docs draw from a ~40
    word vocabulary, where 4-gram collisions occur at a realistic ~5%
    rate while 8-grams almost never collide — k=4 exercises the
    overlap machinery non-vacuously at test SF."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    flags = decontaminate(train, bench, k=4)
    return (
        train.select("doc_id", "source")
        .join(flags, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum("contaminated").alias("n_contaminated"),
        )
        .orderBy("source")
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc mean unigram negative log-likelihood (perplexity proxy).

    The CCNet/CC-style LM quality filter reduced to its scalable core:
    score each document by how surprising its tokens are under the
    corpus's own unigram distribution, nll = -(1/n) sum ln(cnt/total).
    High-nll docs are gibberish/rare-token soup; low-nll docs are
    boilerplate. (A real KenLM scorer drops into the same plan shape as
    a pandas_udf — this column-expression form needs no model file.)

    Scale: token explode -> hash-agg vocabulary [shuffle 1] -> join
    token stream to vocabulary counts [shuffle 2, vocab-sized build
    side] -> per-doc aggregate [shuffle 3 on doc_id]. The 1-row total
    broadcasts. Integer counts; the ln/divide floats are summed per doc
    and rounded to 4 dp on both engines (sum re-association error
    ~1e-13 against a 5e-5 rounding quantum).
    """
    toks = tokenize(F.col(text_col))
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        tok.join(counts, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("cnt") / F.col("total")))
                / F.count(F.lit(1)),
                4,
            ).alias("nll"),
        )
        .orderBy("doc_id")
    )


def doc_token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, token, cnt) — the compact per-doc sufficient statistic
    for ``unigram_logprob``. The incremental curation pipeline appends
    these rows per crawl batch (the one text pass each doc ever pays)
    and re-derives every doc's nll under the EVOLVING corpus LM from
    the index alone via ``unigram_logprob_from_counts`` — the unigram
    distribution is global state no per-doc cache can make incremental,
    but the recompute never has to touch text again."""
    toks = tokenize(F.col(text_col))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_logprob_from_counts(tok_counts: DataFrame) -> DataFrame:
    """``unigram_logprob`` re-derived from a ``doc_token_counts``
    relation: same output schema and 4-dp rounding. The per-doc sum is
    weighted by cnt rather than repeated per occurrence — re-association
    noise ~1e-13 against the 5e-5 rounding quantum, the same tolerance
    the batch operator already relies on for its own shuffle order."""
    counts = tok_counts.groupBy("token").agg(F.sum("cnt").alias("gcnt"))
    total = counts.agg(F.sum("gcnt").alias("total"))
    return (
        tok_counts.join(counts, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("cnt") * F.log(F.col("gcnt") / F.col("total"))
                )
                / F.sum("cnt"),
                4,
            ).alias("nll"),
        )
        .orderBy("doc_id")
    )


def q_doc_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal score per document (quality filter input)."""
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs)


def bigram_logprob(
    docs: DataFrame,
    lam: float = 0.7,
    lam_uni: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc mean interpolated-bigram negative log-likelihood — the
    next step up from ``unigram_logprob`` toward the KenLM-style
    fluency filters production corpus pipelines run.

    p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1}) +
    lam_uni * c(w_i)/total; nll = -(1/(n-1)) sum_{i>=2} ln p. The
    weights are two EXPLICIT literals (not lam and Python-computed
    1-lam: a Python-side subtraction can differ from the oracle's
    literal by 1 ulp). The
    bigram term catches word-salad that unigram surprisal cannot (all
    common words, impossible transitions); the unigram interpolation
    keeps unseen bigrams finite without Katz/KN backoff machinery.
    Only docs with >= 2 tokens appear (no transitions otherwise).

    Scale: ONE positioned-token projection feeds (a) the bigram
    relation via a within-doc position self-join — equi-join on
    (doc_id, pos+1), co-partitioned, no window — (b) unigram counts
    [hash-agg], (c) bigram counts [hash-agg]. Score assembly is two
    vocabulary-sized joins plus a 1-row total broadcast; the per-doc
    aggregate is the only doc-keyed shuffle. Integer counts end-to-end;
    the single float sum is rounded to 4 dp on both engines.
    """
    toks = tokenize(F.col(text_col))
    tok_pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "token"),
    )
    uni = tok_pos.groupBy("token").agg(F.count(F.lit(1)).alias("uc"))
    total = uni.agg(F.sum("uc").alias("total"))
    a = tok_pos.select("doc_id", "pos", F.col("token").alias("w1"))
    bsd = tok_pos.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("token").alias("w2")
    )
    bigrams = a.join(bsd, ["doc_id", "pos"])
    bc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    p = (
        F.lit(lam) * F.col("bc") / F.col("uc")
        + F.lit(lam_uni) * F.col("uc2") / F.col("total")
    )
    return (
        bigrams.join(bc, ["w1", "w2"])
        .join(uni, F.col("w1") == F.col("token"))
        .drop("token")
        .join(
            uni.select(
                F.col("token").alias("_t2"), F.col("uc").alias("uc2")
            ),
            F.col("w2") == F.col("_t2"),
        )
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            (F.count(F.lit(1)) + F.lit(1)).alias("n_tokens"),
            F.round(-F.sum(F.log(p)) / F.count(F.lit(1)), 4).alias(
                "bigram_nll"
            ),
        )
        .orderBy("doc_id")
    )


def q_doc_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM surprisal per document (fluency filter)."""
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs)


def _winnow_fp(
    docs: DataFrame,
    k: int = 3,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (doc_id, win_min) winnowing fingerprints
    (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): hash
    every k-gram, slide a window of ``w`` consecutive hashes, keep each
    window's minimum. Guarantees any shared run of >= w+k-1 tokens
    between two documents shares at least one fingerprint — the
    substring-level complement to set-level MinHash (which only sees
    bag-of-shingles overlap). Shared core of ``winnow_fingerprints``
    (per-doc manifest) and ``winnow_pairs`` (clone candidates).

    Scale: one shuffle on doc_id; the sliding min is a bounded ROWS
    frame inside each doc partition (per-doc sequential work is
    inherent to winnowing — position order is the algorithm). Hashes
    are md5-derived 48-bit ints, identical in DuckDB.
    """
    # TWO materialization steps, both load-bearing: tokens first (the
    # shingle transform references its input per ELEMENT, so an inlined
    # regex tokenizer re-runs per shingle — measured ~6s of a 10s wall
    # at sf0.1), then the gram array (its size is taken pre-explode,
    # avoiding a second max(pos) window over the exploded relation).
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("_toks"),
    )
    arr = tk.select(
        "doc_id", shingles(F.col("_toks"), k).alias("_sh")
    )
    grams = arr.select(
        "doc_id",
        F.size("_sh").alias("n_grams"),
        F.posexplode("_sh").alias("pos0", "gram"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("pos"),
        "gram",
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 12), 16, 10).cast(
        "bigint"
    )
    hashed = grams.select("doc_id", "n_grams", "pos", h.alias("h"))
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        hashed.withColumn("win_min", F.min("h").over(frame))
        .filter(F.col("pos") <= F.col("n_grams") - (w - 1))
        .select("doc_id", "win_min")
        .distinct()
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc winnowing manifest: distinct-fingerprint count, min
    fingerprint, and a sum checksum (exact-set oracle handles; see
    ``_winnow_fp`` for the algorithm and scale notes)."""
    fp = _winnow_fp(docs, k, w, text_col, id_col)
    return (
        fp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.min("win_min").alias("min_fp"),
            F.sum("win_min").alias("fp_checksum"),
        )
        .orderBy("doc_id")
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_rel: DataFrame | None = None,
) -> DataFrame:
    """Substring-level clone candidates: doc pairs sharing >=
    ``min_shared`` winnowing fingerprints.

    The cross-doc face of winnowing — detects PARTIAL overlap (a copied
    paragraph inside otherwise-different documents) that set-level
    MinHash/Jaccard dilutes below threshold. Guarantee: two docs
    sharing any token run of length >= w+k-1 share a fingerprint, so
    every such clone pair is a candidate.

    Scale: same hot-key discipline as the LSH families — fingerprints
    with document frequency > ``max_df`` are boilerplate, carry no
    discriminative signal, and would fan out quadratically; they are
    dropped BEFORE the self-join (window-count + filter), bounding
    per-fingerprint fan-out at C(max_df, 2). One equi-join on the
    fingerprint, one aggregate to pairs.

    ``fp_rel`` (a (doc_id, win_min) relation, ``_winnow_fp``'s schema)
    replaces the text pass — the incremental-curation path feeds the
    persisted fingerprint index restricted to the current survivor set,
    so the df-filter and pair join see exactly the rows a fresh
    ``_winnow_fp(docs)`` would produce without re-tokenizing anything.
    The document-frequency cut is computed over whatever relation is
    passed, matching the batch semantics where df is relative to the
    input doc set.
    """
    fp = (
        fp_rel
        if fp_rel is not None
        else _winnow_fp(docs, k, w, text_col, id_col)
    )
    df_w = Window.partitionBy("win_min")
    rare = fp.withColumn("_df", F.count(F.lit(1)).over(df_w)).filter(
        F.col("_df") <= max_df
    )
    a = rare.select(F.col("doc_id").alias("id_a"), "win_min")
    b = rare.select(F.col("doc_id").alias("id_b"), "win_min")
    return (
        a.join(b, "win_min")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
        .orderBy("id_a", "id_b")
    )


def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint manifest per document (k=3 grams, w=5)."""
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs)


def q_doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing >= 2 winnowing fingerprints (clone candidates)."""
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return winnow_pairs(docs, min_shared=2)


def source_contamination_matrix(
    docs: DataFrame,
    k: int = 3,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise content overlap BETWEEN sources: which corpora copy
    from each other (mirror sites, cross-posted boilerplate, scraped
    aggregators). For every source pair: shared distinct k-shingles and
    the shingle-set Jaccard in basis points.

    Scale: the key move is deduplicating to distinct (source, shingle)
    BEFORE the self-join — per shingle the join fan-out is then bounded
    by C(#sources, 2) pairs regardless of how many documents contain
    it, so a boilerplate shingle in a billion docs costs the same as a
    rare one. One shuffle to dedup, one equi-join on shingle, one
    aggregate to the (tiny) pair matrix; per-source set sizes broadcast
    back. Integer counts; Jaccard quantized to basis points.
    """
    toks = docs.select(
        F.col(strata_col).alias("source"),
        tokenize(F.col(text_col)).alias("_toks"),
    )
    ssh = toks.select(
        "source", F.explode(shingles(F.col("_toks"), k)).alias("sh")
    ).distinct()
    sizes = ssh.groupBy("source").agg(F.count(F.lit(1)).alias("set_size"))
    a = ssh.select(F.col("source").alias("source_a"), "sh")
    b = ssh.select(F.col("source").alias("source_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("set_size").alias("size_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("set_size").alias("size_b")
    )
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_shingles",
            F.round(
                F.lit(10000.0)
                * F.col("shared_shingles")
                / (
                    F.col("size_a") + F.col("size_b")
                    - F.col("shared_shingles")
                )
            )
            .cast("bigint")
            .alias("jaccard_bp"),
        )
        .orderBy("source_a", "source_b")
    )


def q_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair shingle-overlap matrix (cross-corpus contamination)."""
    docs = load_table(spark, sf_dir, "documents")
    return source_contamination_matrix(docs)


# C4-style token blocklist (Raffel et al. 2020 filter family: drop or
# flag documents whose blocked-token mass exceeds a threshold). The
# production list would be the public "List of Dirty, Naughty ..." set;
# the synthetic corpus has no profanity, so the shipped default is a
# placeholder drawn from its vocabulary — the OPERATOR (broadcast list,
# per-doc fraction, threshold flag) is the deliverable, the list is
# config.
BLOCKLIST_DEFAULT = ("dup", "slow", "scan")
BLOCKLIST_MAX_BP = 800  # flag docs with > 8% blocked-token mass


def blocklist_signals(
    docs: DataFrame,
    blocklist: tuple[str, ...] = BLOCKLIST_DEFAULT,
    max_bp: int = BLOCKLIST_MAX_BP,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Per-document blocked-token count / fraction and a keep flag.

    Pure projection over the tokenized text: ``F.filter`` with an
    ``F.array_contains`` predicate on a literal array (the list is a
    plan constant — for a list too big to inline, swap in a broadcast
    semi-join on an exploded tokens relation; same output). ZERO
    shuffles, whole-stage codegen, trivially parallel at 100 TB.

    Fractions are integer basis points (see module docstring); empty
    docs report 0 bp and keep=true. ``ordered=False`` skips the final
    presentation sort — required on streaming inputs (global sort is
    illegal in append mode) and the shape a 100 TB batch deploy wants
    anyway; the operator is otherwise streaming-safe as-is (stateless
    projection).
    """
    toks = tokenize(F.col(text_col))
    bl = lit_array(list(blocklist))
    blocked = F.size(F.filter(toks, lambda t: F.array_contains(bl, t)))
    total = F.size(toks)
    bp = F.when(total > 0, _bp(blocked, total)).otherwise(F.lit(0))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("source"),
        total.alias("n_tokens"),
        blocked.alias("blocked_tokens"),
        bp.alias("blocked_bp"),
        (bp <= F.lit(max_bp)).alias("keep"),
    )
    return out.orderBy("doc_id") if ordered else out


def q_doc_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-token fraction + keep flag per document (C4-style)."""
    docs = load_table(spark, sf_dir, "documents")
    return blocklist_signals(docs)


# fastText-style hashed linear classifier (Joulin et al. 2016): the
# standard cheap quality/domain classifier in LLM-data pipelines
# (CCNet, GPT-3's WebText logistic filter, FineWeb-Edu's scorer all sit
# on this shape). Features are hashed unigrams; the shipped weights are
# md5-derived pseudo-weights standing in for a trained vector — the
# SCORING PLUMBING (hash -> bucket -> weight lookup -> mean -> sigmoid)
# is the deliverable and is exactly what a trained model would run.
CLASSIFIER_BUCKETS = 4096


def _hash_bucket(col: Column, n_buckets: int) -> Column:
    """md5-derived feature bucket — layout/engine-invariant (same recipe
    as sampling.doc_shards / similarity.shard_embedding_stats)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def _bucket_weight(bucket: Column) -> Column:
    """Deterministic pseudo-weight in [-1, 1]: md5('w' || bucket) mapped
    to {-1000..1000}/1000. A trained model would replace this with a
    broadcast-joined weight table — the plan shape is identical."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w"), bucket.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (h % 2001 - 1000).cast("double") / F.lit(1000.0)


def linear_quality_score(
    docs: DataFrame,
    n_buckets: int = CLASSIFIER_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-linear classifier score per document.

    score = sigmoid(mean over token occurrences of w[h(token)]) — the
    fastText mean-of-embeddings shape with a 1-d output. Tokens hash to
    ``n_buckets`` feature buckets (md5, engine-invariant); the weight is
    a pure expression of the bucket, so the whole scorer is explode ->
    per-doc hash-agg — ONE shuffle on doc_id, no joins, no Python. With
    trained weights the ``_bucket_weight`` expression becomes a
    broadcast join against a (bucket, weight) table: still one shuffle.

    Parity: weights are exact multiples of 1e-3, so the per-doc weight
    sum rounded at 6 dp is shuffle-order-invariant; the mean uses the
    engine-stable half-up division (``stable_round_div``, never
    ``F.avg`` on doubles — repo parity rule) and the sigmoid is
    computed from the SAME deterministic round(sum,6)/count double on
    both engines before its own 4 dp rounding. Docs with zero tokens
    are scored at sigmoid(0) = 0.5 exactly.
    """
    from bigdataminingproject_spark.functions.numeric import stable_round_div

    toks = tokenize(F.col(text_col))
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(toks).alias("token")
    )
    w = F.when(
        F.col("token").isNotNull(),
        _bucket_weight(_hash_bucket(F.col("token"), n_buckets)),
    )
    agg = tok.groupBy("doc_id").agg(
        F.count(F.col("token")).alias("n_tokens"),
        F.coalesce(F.round(F.sum(w), 6), F.lit(0.0)).alias("_s6"),
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    mean = F.col("_s6") / denom
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-mean))
    return agg.select(
        "doc_id",
        "n_tokens",
        stable_round_div(F.col("_s6"), denom, 4).alias("margin"),
        F.round(sig, 4).alias("quality_prob"),
    ).orderBy("doc_id")


def q_doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear classifier probability per document."""
    docs = load_table(spark, sf_dir, "documents")
    return linear_quality_score(docs)


GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_LEN = 3  # mean token length bounds, Rae et al. 2021 §A1.1
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MIN_DISTINCT_BP = 2000
GOPHER_MAX_TOP_UNI_BP = 3000
GOPHER_MAX_TOP_BI_BP = 2000
GOPHER_MIN_STOPWORDS = 2


def gopher_gate(docs: DataFrame) -> DataFrame:
    """The composed Gopher-style document gate (Rae et al. 2021, §A1.1):
    every rule family this engine scores individually, folded into one
    keep/drop decision per document — the boolean a bulk filter actually
    consumes.

    Rules (ALL integer arithmetic — counts and basis points — so the
    oracle comparison has no float surface at all):
      R1 token count in [10, 100k];
      R2 mean token length in [3, 10], tested as
         3*n_tokens <= sum(len(token)) <= 10*n_tokens (division-free);
      R3 distinct-token fraction >= 20% (2000 bp);
      R4 top unigram mass <= 30%;
      R5 top bigram mass <= 20%;
      R6 at least 2 stopword occurrences (the "is it prose?" check).

    One tokenizing scan feeds both the repetition aggregation (explode +
    two-level hash agg, skew-free keys) and the per-row length/stopword
    projection; the join key is doc_id.
    """
    from bigdataminingproject_spark.functions.text import (
        ENGLISH_STOPWORDS,
        tokenize,
    )

    rep = repetition_signals(docs).select(
        "doc_id", "n_tokens", "distinct_bp", "top_unigram_bp",
        "top_bigram_bp",
    )
    stop_arr = lit_array(list(ENGLISH_STOPWORDS))
    toks = docs.select("doc_id", tokenize("text").alias("_t"))
    row = toks.select(
        "doc_id",
        F.aggregate(
            "_t", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("sum_token_chars"),
        F.size(
            F.filter("_t", lambda t: F.array_contains(stop_arr, t))
        ).cast("long").alias("n_stopword_hits"),
    )
    g = rep.join(row, "doc_id")
    keep = (
        (F.col("n_tokens") >= GOPHER_MIN_TOKENS)
        & (F.col("n_tokens") <= GOPHER_MAX_TOKENS)
        & (
            F.col("sum_token_chars")
            >= GOPHER_MIN_MEAN_LEN * F.col("n_tokens")
        )
        & (
            F.col("sum_token_chars")
            <= GOPHER_MAX_MEAN_LEN * F.col("n_tokens")
        )
        & (F.col("distinct_bp") >= GOPHER_MIN_DISTINCT_BP)
        & (F.col("top_unigram_bp") <= GOPHER_MAX_TOP_UNI_BP)
        & (F.col("top_bigram_bp") <= GOPHER_MAX_TOP_BI_BP)
        & (F.col("n_stopword_hits") >= GOPHER_MIN_STOPWORDS)
    )
    return (
        g.select(
            "doc_id",
            "n_tokens",
            "sum_token_chars",
            "distinct_bp",
            "top_unigram_bp",
            "top_bigram_bp",
            "n_stopword_hits",
            keep.alias("keep"),
        )
        .orderBy("doc_id")
    )


def q_doc_gopher_gate(spark, sf_dir: str) -> DataFrame:
    """Composed Gopher-rule keep/drop decision for every document."""
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return gopher_gate(docs)
