"""Training-data corpus curation — the operators composed into the
pipeline they exist for.

A 100 TB pretraining-data pass is: quality-gate → exact dedup → near-dup
prune → emit the curated corpus plus an audit trail. Each stage is one
of this engine's operator families; this module chains them as a single
lazy plan-set so Catalyst sees the whole flow (filters push into the
scan, dedup joins reuse the tokenized projection) and nothing larger
than the audit counters ever reaches the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.functions.text import tokenize
from bigdataminingproject_spark.operators.dedup import (
    exact_duplicates,
    ngram_jaccard_pairs,
)
from bigdataminingproject_spark.operators.minhash import minhash_lsh_pairs
from bigdataminingproject_spark.operators.textstats import quality_features


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    neardup_threshold: float = 0.85,
) -> tuple[DataFrame, dict[str, Any]]:
    """Quality-gate, exact-dedup, and near-dup-prune a document corpus.

    Returns (curated DataFrame, audit stats). Keeper policy everywhere is
    min-id (deterministic, order-stable): the first occurrence survives,
    mirroring the reference's check-then-insert stance (A10).
    """
    total = docs.count()

    # 1. quality gate — pure column predicates, pushed into the scan
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        tokenize(F.col(text_col)).alias("_toks"),
    )
    f = quality_features(F.col("text"), tokens=F.col("_toks"))
    gated = tk.filter(
        (f["n_tokens"] >= min_tokens)
        & (f["stopword_ratio"] <= max_stopword_ratio)
    ).drop("_toks")
    after_quality = gated.count()

    # 2. exact dedup — drop every member of a duplicate group but the keeper
    groups = exact_duplicates(gated, text_col="text", id_col="doc_id")
    losers = groups.select(
        F.explode("member_ids").alias("doc_id"), "keeper_id"
    ).filter(F.col("doc_id") != F.col("keeper_id")).select("doc_id")
    exact_kept = gated.join(losers, "doc_id", "left_anti")
    after_exact = exact_kept.count()

    # 3. near-dup prune — MinHash LSH pairs; higher id of each pair drops
    pairs = minhash_lsh_pairs(
        exact_kept, threshold=neardup_threshold, text_col="text"
    )
    near_losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    curated = exact_kept.join(near_losers, "doc_id", "left_anti")
    after_near = curated.count()

    stats = {
        "input_docs": total,
        "after_quality_gate": after_quality,
        "after_exact_dedup": after_exact,
        "after_neardup_prune": after_near,
        "dropped": {
            "low_quality": total - after_quality,
            "exact_duplicates": after_quality - after_exact,
            "near_duplicates": after_exact - after_near,
        },
        "retention_rate": round(after_near / total, 4) if total else 0.0,
    }
    return curated, stats


def q_corpus_curation(spark, sf_dir: str) -> DataFrame:
    """Oracle-checkable curation: quality gate → exact dedup (min-id
    keeper) → near-dup prune by EXACT n-gram Jaccard (the SQL-expressible
    twin of the MinHash path in curate_corpus). Returns surviving doc_ids.
    """
    from bigdataminingproject_spark.operators.dedup import (
        exact_duplicates,
        ngram_jaccard_pairs,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", "text", tokenize(F.col("text")).alias("_toks")
    )
    f = quality_features(F.col("text"), tokens=F.col("_toks"))
    gated = tk.filter(
        (f["n_tokens"] >= 5) & (f["stopword_ratio"] <= 0.9)
    ).drop("_toks")
    groups = exact_duplicates(gated, text_col="text", id_col="doc_id")
    losers = (
        groups.select(F.explode("member_ids").alias("doc_id"), "keeper_id")
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id")
    )
    exact_kept = gated.join(losers, "doc_id", "left_anti")
    pairs = ngram_jaccard_pairs(exact_kept, threshold=0.5, text_col="text")
    near_losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        exact_kept.join(near_losers, "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


def curation_state(
    docs: DataFrame,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    neardup_threshold: float = 0.5,
) -> DataFrame:
    """Day-0 curation state for the incremental pass: the exact-kept
    manifest (doc_id, text, dropped_neardup).

    The state a 100 TB incremental pipeline persists between crawls is
    NOT the raw corpus — it is the quality-gated, exact-deduped
    manifest (one row per distinct normalized text, min-id keeper),
    with a flag marking which members the near-dup prune dropped.
    Everything the next day's merge needs is derivable from it:
    a new doc loses exact dedup iff its md5 appears here, and loses the
    near-dup prune iff it Jaccard-pairs with ANY row here or a
    same-day keeper of smaller id. Quality/dup losers from past crawls
    are gone for good and never rescanned.
    """
    tk = docs.select(
        "doc_id", "text", tokenize(F.col("text")).alias("_toks")
    )
    f = quality_features(F.col("text"), tokens=F.col("_toks"))
    gated = tk.filter(
        (f["n_tokens"] >= min_tokens)
        & (f["stopword_ratio"] <= max_stopword_ratio)
    ).drop("_toks")
    groups = exact_duplicates(gated, text_col="text", id_col="doc_id")
    losers = (
        groups.select(F.explode("member_ids").alias("doc_id"), "keeper_id")
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id")
    )
    exact_kept = gated.join(losers, "doc_id", "left_anti")
    near_losers = (
        ngram_jaccard_pairs(exact_kept, threshold=neardup_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return exact_kept.join(near_losers, "doc_id", "left").select(
        "doc_id",
        "text",
        F.coalesce(F.col("_dropped"), F.lit(0)).alias("dropped_neardup"),
    )


def curate_corpus_increment(
    state: DataFrame,
    delta: DataFrame,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    neardup_threshold: float = 0.5,
    state_shingles: DataFrame | None = None,
) -> DataFrame:
    """Merge a delta crawl into yesterday's curation state WITHOUT
    rescanning the corpus the state was built from. Returns the updated
    state (same schema as ``curation_state``); today's kept set is its
    ``dropped_neardup == 0`` rows.

    Exactness (increment == full rerun on the union), provable from id
    monotonicity — every delta id exceeds every state id (crawl order):

    1. Quality gate: a per-doc predicate; snapshot verdicts can't move.
    2. Exact dedup, min-id keeper: a union md5-group seen in the
       snapshot keeps its snapshot keeper (the min over the union IS
       the min over the snapshot — all delta ids are larger), so state
       rows never change; delta-only groups resolve within the delta.
    3. Near-dup prune drops the HIGHER id of every Jaccard >= t pair,
       so a pair can only ever drop a delta doc unless both ends are
       snapshot docs — and those pairs were already decided yesterday.
       Snapshot flags are therefore final, and a delta keeper drops iff
       it pairs with any exact-kept doc of smaller id. That membership
       is computed with the PPJoin restricted to delta-side candidates
       (``b_side_ids``): prefix explosion and candidate pairs are
       delta-bounded; the retained manifest is probe-side only.

    Daily cost is O(delta scan + |state| re-shingle for the probe side
    + delta-bounded candidate join) — pass ``state_shingles`` (the
    persisted (doc_id, shingle_h) index ``shingle_relation`` produces)
    to make the probe side a pure read, the shape a production run and
    the streaming maintenance twin use; without it the state side is
    re-shingled from text, keeping the one-shot registry query
    self-contained.
    """
    return state.unionByName(
        curate_delta_state(
            state,
            delta,
            min_tokens=min_tokens,
            max_stopword_ratio=max_stopword_ratio,
            neardup_threshold=neardup_threshold,
            state_shingles=state_shingles,
        )
    )


def curate_delta_state(
    state: DataFrame,
    delta: DataFrame,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    neardup_threshold: float = 0.5,
    state_shingles: DataFrame | None = None,
) -> DataFrame:
    """The NEW manifest rows a delta crawl adds to the curation state
    (same schema as the state; ``curate_corpus_increment`` is this plus
    the union). Split out so an append-only store — the production
    manifest pattern and the streaming twin — can write ONLY the delta
    rows per day instead of rewriting the whole state."""
    from bigdataminingproject_spark.operators.dedup import (
        shingle_relation,
    )

    tk = delta.select(
        "doc_id", "text", tokenize(F.col("text")).alias("_toks")
    )
    f = quality_features(F.col("text"), tokens=F.col("_toks"))
    gated = tk.filter(
        (f["n_tokens"] >= min_tokens)
        & (f["stopword_ratio"] <= max_stopword_ratio)
    ).drop("_toks")
    # exact dedup against the state (md5 membership; any match loses to
    # the older keeper) then within the delta (min-id keeper).
    norm = F.md5(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    state_hashes = state.select(norm.alias("_h")).distinct()
    fresh = gated.withColumn("_h", norm).join(
        state_hashes, "_h", "left_anti"
    )
    delta_keepers = (
        fresh.withColumn(
            "_keeper",
            F.min("doc_id").over(Window.partitionBy("_h")),
        )
        .filter(F.col("doc_id") == F.col("_keeper"))
        .select("doc_id", "text")
    )
    # near-dup: delta keepers drop iff they pair with ANY exact-kept
    # doc (state rows — dropped ones included, matching the full
    # pipeline, which prunes against every exact-kept doc — or an
    # earlier delta keeper).
    union_kept = state.select("doc_id", "text").unionByName(delta_keepers)
    union_sh = None
    if state_shingles is not None:
        # probe side from the persisted index; only the (small) delta
        # keepers pay the tokenize/shingle pass
        union_sh = state_shingles.select("doc_id", "shingle_h").unionByName(
            shingle_relation(delta_keepers)
        )
    pairs = ngram_jaccard_pairs(
        union_kept,
        threshold=neardup_threshold,
        b_side_ids=delta_keepers.select("doc_id"),
        shingle_rel=union_sh,
    )
    delta_losers = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return delta_keepers.join(delta_losers, "doc_id", "left").select(
        "doc_id",
        "text",
        F.coalesce(F.col("_dropped"), F.lit(0)).alias("dropped_neardup"),
    )


def _source_fingerprint(sf_dir: str, table: str) -> str:
    """Cheap content fingerprint of a table's parquet file(s): sorted
    (relpath, size, mtime_ns) triples. Covers both the single-file
    fixtures and Spark-written directory parquet (the 10x probe dir).
    Used to key the materialized day-0 curation state so in-place
    fixture regeneration at the same row count rotates the cache key
    (ADVICE r5)."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for fn in files:
                fp = os.path.join(root, fn)
                st = os.stat(fp)
                entries.append(
                    f"{os.path.relpath(fp, path)}:{st.st_size}:{st.st_mtime_ns}"
                )
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append(f"{table}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(sorted(entries))


def _split_cutoff(docs: DataFrame) -> int:
    """80/20 snapshot/delta doc_id cutoff (one scalar collect)."""
    return int(
        docs.agg(
            F.floor(F.max("doc_id") * F.lit(0.8)).cast("long")
        ).collect()[0][0]
    )


def materialized_state_dir(
    spark, sf_dir: str, snap: DataFrame, cutoff: int
) -> str:
    """Build-or-reuse the day-0 curation state parquet and return its dir.

    MATERIALIZING the state is exactly what the day boundary does in
    production — state is read from storage, not recomputed: the merge
    references the state relation three times (md5 set, pair probe
    side, final union), and without the parquet round trip each
    reference re-runs the whole snapshot pipeline (measured 2.2x
    slower at sf0.1). The dir is KEYED by (corpus dir, cutoff, a
    CONTENT fingerprint of the source parquet files) and reused when
    present — repeated calls, like a production day-2 run or the
    bench's best-of-3, pay only the incremental merge. ADVICE r5
    hardening: the fingerprint covers file sizes + mtimes (in-place
    fixture regeneration rotates the key even at identical row
    counts), and the state is written to a unique temp dir then
    atomically renamed so concurrent runs can never observe a
    half-written or mid-overwrite state; the rename loser reuses the
    winner's identical state.
    """
    import hashlib
    import os
    import tempfile

    n_snap = snap.count()
    sig = _source_fingerprint(sf_dir, "documents")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{cutoff}:{n_snap}:{sig}".encode()
    ).hexdigest()[:16]
    state_dir = os.path.join(
        tempfile.gettempdir(), f"bdmp_curation_state_{key}"
    )
    if not os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        stage_dir = tempfile.mkdtemp(
            prefix=f"bdmp_curation_stage_{key}_"
        )
        stage = os.path.join(stage_dir, "state")
        curation_state(snap).write.mode("overwrite").parquet(stage)
        try:
            os.rename(stage, state_dir)
        except OSError:
            pass  # a concurrent run won the race; its state is identical
        finally:
            import shutil

            shutil.rmtree(stage_dir, ignore_errors=True)
    return state_dir


def materialized_shingles_dir(spark, state_dir: str) -> str:
    """Build-or-reuse the persisted shingle index of a materialized
    curation state — the (doc_id, shingle_h) parquet a production
    incremental pipeline carries alongside its manifest so the PPJoin's
    probe side is a pure read. Keyed off the (already content-keyed)
    state dir; same stage-then-atomic-rename discipline."""
    import os
    import shutil
    import tempfile

    sh_dir = state_dir.rstrip("/") + "_shingles"
    if not os.path.exists(os.path.join(sh_dir, "_SUCCESS")):
        from bigdataminingproject_spark.operators.dedup import (
            shingle_relation,
        )

        stage_dir = tempfile.mkdtemp(prefix="bdmp_shingle_stage_")
        stage = os.path.join(stage_dir, "shingles")
        shingle_relation(spark.read.parquet(state_dir)).write.mode(
            "overwrite"
        ).parquet(stage)
        try:
            os.rename(stage, sh_dir)
        except OSError:
            pass  # concurrent builder won; identical content
        finally:
            shutil.rmtree(stage_dir, ignore_errors=True)
    return sh_dir


def q_corpus_curation_incremental(spark, sf_dir: str) -> DataFrame:
    """Incremental curation manifest (VERDICT r4 #3): the first 80% of
    doc ids are yesterday's crawl (folded into a curation state), the
    rest are today's delta; the delta is merged WITHOUT rescanning
    yesterday's corpus. The DuckDB oracle runs the FULL v1 curation
    pipeline over the whole table — the driver row is therefore a
    cross-engine attestation that increment == full rerun (the
    merge==full equivalence also holds Spark-vs-Spark; see
    tests/test_curation.py).
    """
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cutoff = _split_cutoff(docs)
    snap = docs.filter(F.col("doc_id") <= cutoff)
    delta = docs.filter(F.col("doc_id") > cutoff)
    state = spark.read.parquet(
        materialized_state_dir(spark, sf_dir, snap, cutoff)
    )
    merged = curate_corpus_increment(state, delta)
    return (
        merged.filter(F.col("dropped_neardup") == 0)
        .select(
            "doc_id",
            (F.col("doc_id") > cutoff).cast("int").alias("is_new"),
        )
        .orderBy("doc_id")
    )


def curate_corpus_v2(
    docs: DataFrame,
    cap_per_source: int = 40,
    clone_min_shared: int = 2,
    nll_sigma: float = 2.0,
) -> DataFrame:
    """Round-3 curation pass: the modern corpus signals composed into
    one lazy plan.

    1. **Domain cap** (host balancing): keep the ``cap_per_source``
       longest docs per source — one partitioned rank window.
    2. **Clone prune** (winnowing): among survivors, drop the higher id
       of every pair sharing >= ``clone_min_shared`` winnowing
       fingerprints — catches copied PARAGRAPHS that whole-doc Jaccard
       dilutes (the v1 pipeline's blind spot).
    3. **Surprisal band** (unigram LM): score every doc against the
       FULL corpus's unigram distribution (the fixed-LM stance) and
       drop survivors more than ``nll_sigma`` sample standard
       deviations above the corpus mean nll — gibberish/rare-token
       soup. The cut is a 1-row broadcast aggregate, never a global
       rank over the scaling per-doc relation.

    Output: surviving (doc_id, source, n_tokens, nll) manifest. Every
    stage is an oracle-checked operator; q_corpus_curation_v2 is the
    composed oracle query.
    """
    from bigdataminingproject_spark.operators.quality import (
        unigram_logprob,
        winnow_pairs,
    )
    from bigdataminingproject_spark.operators.sampling import domain_cap

    capped = domain_cap(docs, cap=cap_per_source).select("doc_id", "source")
    kept_docs = docs.join(capped.select("doc_id"), "doc_id", "left_semi")
    clones = winnow_pairs(kept_docs, min_shared=clone_min_shared)
    clone_losers = clones.select(F.col("id_b").alias("doc_id")).distinct()
    pruned = capped.join(clone_losers, "doc_id", "left_anti")
    nll = unigram_logprob(docs)  # full-corpus LM, not survivor-only
    # The cut is rounded to the same 4dp quantum as the per-doc nll it is
    # compared against: avg/stddev accumulate in engine-specific order, so
    # the unrounded cut differs by ~1e-15 between Spark and an oracle and
    # could flip membership of a doc sitting exactly at the threshold.
    cut = nll.agg(
        F.round(
            F.avg("nll") + F.lit(nll_sigma) * F.stddev_samp("nll"), 4
        ).alias("_cut")
    )
    return (
        pruned.join(nll, "doc_id")
        .join(F.broadcast(cut))
        .filter(F.col("nll") <= F.col("_cut"))
        .select("doc_id", "source", "n_tokens", "nll")
        .orderBy("doc_id")
    )


def q_corpus_curation_v2(spark, sf_dir: str) -> DataFrame:
    """Composed round-3 curation: domain cap -> winnowing clone prune ->
    unigram-surprisal band. Returns the surviving doc manifest."""
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return curate_corpus_v2(docs)


def curate_corpus_v3(
    docs: DataFrame,
    bench: DataFrame,
    cap_per_source: int = 40,
    clone_min_shared: int = 2,
    nll_sigma: float = 2.0,
    decontam_k: int = 4,
    redact_text: Column | None = None,
) -> DataFrame:
    """The full ingest→tokenize gate: every quality family in ONE lazy
    plan.

    1. **Benchmark decontamination** (first — leakage removal shrinks
       everything downstream): drop any doc sharing a ``decontam_k``-
       token shingle with the benchmark set. The benchmark shingle set
       is broadcast; the corpus side never shuffles for it.
    2. **Curation v2** over the clean corpus: domain cap → winnowing
       clone prune → unigram-surprisal band (the LM is fit on the
       DECONTAMINATED corpus — a leaked benchmark doc must not shape
       the probability model either).
    3. **PII redaction** (last — only survivors pay the regex pass):
       per-pattern match counts plus an md5 attest of the redacted
       text. ``redact_text`` overrides the text the redactor sees
       (the registry drill feeds synthetic-PII-augmented text, since
       the test corpus contains none).

    Output: (doc_id, source, n_tokens, nll, n_email, n_phone, n_ip,
    redacted_md5) — the curated-manifest superset of v2's. Stage order
    is load-bearing for scale: decontamination is a broadcast semi-join
    over the full corpus (cheap), the cap bounds the winnowing join,
    and redaction — the only regex-heavy projection — touches only the
    final survivor set.
    """
    from bigdataminingproject_spark.operators.quality import (
        decontaminate,
        pii_redact,
    )

    contaminated = (
        decontaminate(docs, bench, k=decontam_k)
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
    )
    clean = docs.join(contaminated, "doc_id", "left_anti")
    manifest = curate_corpus_v2(
        clean,
        cap_per_source=cap_per_source,
        clone_min_shared=clone_min_shared,
        nll_sigma=nll_sigma,
    )
    text = redact_text if redact_text is not None else F.col("text")
    red = pii_redact(
        docs.select("doc_id", text.alias("text")), "text"
    ).select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        F.md5("text_redacted").alias("redacted_md5"),
    )
    return (
        manifest.join(red, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "nll",
            "n_email",
            "n_phone",
            "n_ip",
            "redacted_md5",
        )
        .orderBy("doc_id")
    )


def q_corpus_curation_v3(spark, sf_dir: str) -> DataFrame:
    """The complete curation gate: benchmark decontamination (every
    25th doc is the held-out benchmark) -> curation v2 (cap -> clone
    prune -> surprisal band) -> PII redaction of the survivors
    (synthetic-PII-augmented text, as in q_doc_pii_redact)."""
    from bigdataminingproject_spark.operators.quality import (
        synthetic_pii_text,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    return curate_corpus_v3(
        train, bench, redact_text=synthetic_pii_text()
    )


def curate_corpus_v4(
    docs: DataFrame,
    bench: DataFrame,
    vectors: DataFrame,
    cap_per_source: int = 40,
    clone_min_shared: int = 2,
    nll_sigma: float = 2.0,
    decontam_k: int = 4,
    redact_text: Column | None = None,
    span_tokens: int = 16,
) -> DataFrame:
    """Curation v4 = the v3 full gate + the two round-4 dedup layers.

    4. **Semantic dedup** (SemDeDup): drop any survivor whose embedding
       sits in another doc's near-duplicate cell at cosine >=
       threshold — catches paraphrases that every lexical layer above
       misses. ``vectors`` is keyed to the doc ids (the synthetic
       corpus aligns vec_id == doc_id; production pipelines carry an
       explicit mapping).
    5. **Span-level rewrite accounting** (exact-substring dedup): for
       each surviving doc, how many 16-token spans survive the
       corpus-wide first-occurrence cut, and the md5 of the rewritten
       text — the manifest a downstream tokenizer consumes instead of
       the raw text.

    Both layers stay lazy: the semantic drop list anti-joins on doc_id
    (cell-bucketed self-join, never cartesian) and the span relation is
    1/W of the token stream with two hash exchanges. Stage cost order
    is preserved: lexical gates shrink the corpus before the
    embedding-space and rewrite passes.
    """
    from bigdataminingproject_spark.operators.dedup import span_dedup
    from bigdataminingproject_spark.operators.similarity import (
        semantic_dedup,
    )

    m3 = curate_corpus_v3(
        docs,
        bench,
        cap_per_source=cap_per_source,
        clone_min_shared=clone_min_shared,
        nll_sigma=nll_sigma,
        decontam_k=decontam_k,
        redact_text=redact_text,
    )
    sem = semantic_dedup(vectors).select(
        F.col("dup_id").alias("doc_id")
    )
    spn = span_dedup(docs, span_tokens=span_tokens).select(
        "doc_id", "kept_spans", "removed_spans", "clean_hash"
    )
    return (
        m3.join(sem, "doc_id", "left_anti")
        .join(spn, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "nll",
            "n_email",
            "n_phone",
            "n_ip",
            "redacted_md5",
            "kept_spans",
            "removed_spans",
            "clean_hash",
        )
        .orderBy("doc_id")
    )


def q_corpus_curation_v4(spark, sf_dir: str) -> DataFrame:
    """v3 gate + semantic dedup + span-rewrite manifest. Benchmark =
    every 25th doc; embeddings restricted to the train ids the same
    way."""
    from bigdataminingproject_spark.operators.quality import (
        synthetic_pii_text,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 25 != 0
    )
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    return curate_corpus_v4(
        train, bench, vecs, redact_text=synthetic_pii_text()
    )


# ---------------------------------------------------------------------------
# Incremental v4 (VERDICT r6 #2): the FULL curation composition —
# decontam → domain cap → winnow clone prune → surprisal band → PII →
# SemDeDup → span rewrite — maintained by a streaming crawl without
# ever rescanning history. The split exploits the stage taxonomy:
#
#   * per-doc signals (gate verdicts, PII counts/md5, token counts,
#     winnowing fingerprints, span decisions, cell assignments) are
#     extracted ONCE at a doc's arrival batch — the only text/vector
#     passes anywhere — and appended to compact indices;
#   * prefix-monotone pairwise decisions (span first-occurrence,
#     SemDeDup candidates) are DECIDED at arrival against the persisted
#     indices: id-monotone crawl order means a later doc can never
#     change an earlier doc's outcome;
#   * the non-monotone scalar stages (domain cap rank, the evolving
#     unigram-LM surprisal cut, the survivor-relative fingerprint
#     df-filter) are re-derived at publish time from the indices alone
#     — cheap aggregations over 1-row-per-doc / per-signal relations,
#     never a re-tokenize.
#
# The publish-time assembly is EXACTLY equal to the batch
# ``curate_corpus_v4`` over the accumulated corpus (same oracle),
# which is what q_stream_curation_v4_maintenance attests.
# ---------------------------------------------------------------------------


def curation_v4_delta_signals(
    delta_docs: DataFrame,
    bench: DataFrame,
    redact_text: Column | None = None,
    decontam_k: int = 4,
    span_tokens: int = 16,
    span_seen: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Arrival-time signal extraction for one crawl batch — every text
    pass the docs of this delta will ever pay. Returns the five index
    deltas the maintenance stores append:

    ``stats``
        1 row/doc: (doc_id, source, len_text, contaminated, n_email,
        n_phone, n_ip, redacted_md5). Decontamination is decided here
        (static benchmark shingle set, broadcast) — per-doc predicate,
        monotone by construction.
    ``tok_counts``
        (doc_id, token, cnt) for NON-contaminated docs (the LM is fit
        on the decontaminated corpus, matching ``curate_corpus_v3``).
    ``winnow_fp``
        (doc_id, win_min) for non-contaminated docs; the publish-time
        clone prune filters this index to the final cap survivors.
    ``span_stats``
        ``span_dedup``'s per-doc manifest, decided against
        ``span_seen`` (the persisted span-hash index) — arrival-time
        decisions equal the full-corpus rerun's by first-occurrence
        monotonicity.
    ``span_kept_hashes``
        the distinct hashes this batch newly claims (its kept spans) —
        the rows to append to the span-hash index.

    Pass the batch relation localCheckpoint'ed or file-backed (a
    foreachBatch source already is): the five plans each re-scan it.
    """
    from bigdataminingproject_spark.operators.dedup import (
        span_flags,
        span_stats_from_flags,
    )
    from bigdataminingproject_spark.operators.quality import (
        _winnow_fp,
        decontaminate,
        doc_token_counts,
        pii_redact,
    )

    text = redact_text if redact_text is not None else F.col("text")
    # The five returned plans are executed by five separate writes, so
    # shared subtrees re-run once per consumer: ``contam`` feeds stats,
    # tok_counts and winnow_fp (3x — each rerun re-shingles both the
    # batch AND the benchmark set), ``flags`` feeds span_stats and
    # span_kept_hashes (2x). Eagerly localCheckpoint both — bounded
    # relations (1 row/doc; 1 row/16-token span) — so each text pass
    # runs once per batch, as the contract above promises (guide §5:
    # persist only reused-and-expensive intermediates; both are cut
    # loose when the executors drop the checkpoint at session GC).
    # Checkpointing ``flags`` additionally SEVERS the returned plans
    # from ``span_seen`` (the live span-hash store scan): the caller
    # may compact that store concurrently with executing these plans,
    # and a lazy scan of directories a merge rmtree's mid-flight is a
    # nondeterministic batch failure (ADVICE r10 #1). After the eager
    # checkpoint here, no returned plan re-reads the store.
    contam = decontaminate(delta_docs, bench, k=decontam_k).localCheckpoint(
        eager=True
    )
    red = pii_redact(
        delta_docs.select("doc_id", text.alias("text")), "text"
    ).select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        F.md5("text_redacted").alias("redacted_md5"),
    )
    stats = (
        delta_docs.select(
            "doc_id", "source", F.length("text").alias("len_text")
        )
        .join(contam, "doc_id")
        .join(red, "doc_id")
    )
    clean = delta_docs.join(
        contam.filter(F.col("contaminated") == 0).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    flags = span_flags(
        delta_docs, span_tokens=span_tokens, seen_hashes=span_seen
    ).localCheckpoint(eager=True)
    return {
        "stats": stats,
        "tok_counts": doc_token_counts(clean),
        "winnow_fp": _winnow_fp(clean),
        "span_stats": span_stats_from_flags(flags).select(
            "doc_id", "kept_spans", "removed_spans", "clean_hash"
        ),
        "span_kept_hashes": flags.filter(F.col("kept") == 1)
        .select("span_h")
        .distinct(),
    }


def assemble_curation_v4(
    stats: DataFrame,
    tok_counts: DataFrame,
    winnow_fp: DataFrame,
    sem_drops: DataFrame,
    span_stats: DataFrame,
    cap_per_source: int = 40,
    clone_min_shared: int = 2,
    nll_sigma: float = 2.0,
) -> DataFrame:
    """Publish-time v4 manifest from the maintained indices alone —
    structurally equal to ``curate_corpus_v4`` over the accumulated
    corpus, stage by stage:

    * domain cap: rank window over the 1-row-per-doc stats (score =
      stored text length, ties by id — ``domain_cap``'s own ordering);
    * clone prune: ``winnow_pairs`` fed the fingerprint index filtered
      to the cap survivors (df-filter relative to survivors, exactly
      the batch's ``winnow_pairs(kept_docs)`` input relation);
    * surprisal band: every doc's nll re-derived from the token-count
      index under the FINAL corpus LM (``unigram_logprob_from_counts``
      — the one stage whose global state makes per-doc caching
      impossible; the recompute is index-only);
    * SemDeDup drop list and span manifest join in as decided.
    """
    from bigdataminingproject_spark.operators.quality import (
        unigram_logprob_from_counts,
        winnow_pairs,
    )
    from bigdataminingproject_spark.operators.sampling import domain_cap

    clean = stats.filter(F.col("contaminated") == 0)
    capped = domain_cap(
        clean.select("doc_id", "source", "len_text"),
        cap=cap_per_source,
        score=F.col("len_text"),
    ).select("doc_id", "source")
    kept_fp = winnow_fp.join(
        capped.select("doc_id"), "doc_id", "left_semi"
    )
    clones = winnow_pairs(
        None, min_shared=clone_min_shared, fp_rel=kept_fp
    )
    clone_losers = clones.select(F.col("id_b").alias("doc_id")).distinct()
    pruned = capped.join(clone_losers, "doc_id", "left_anti")
    nll = unigram_logprob_from_counts(tok_counts)
    cut = nll.agg(
        F.round(
            F.avg("nll") + F.lit(nll_sigma) * F.stddev_samp("nll"), 4
        ).alias("_cut")
    )
    manifest = (
        pruned.join(nll, "doc_id")
        .join(F.broadcast(cut))
        .filter(F.col("nll") <= F.col("_cut"))
        .select("doc_id", "source", "n_tokens", "nll")
    )
    return (
        manifest.join(
            stats.select(
                "doc_id", "n_email", "n_phone", "n_ip", "redacted_md5"
            ),
            "doc_id",
        )
        .join(
            sem_drops.select(F.col("dup_id").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        .join(span_stats, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "nll",
            "n_email",
            "n_phone",
            "n_ip",
            "redacted_md5",
            "kept_spans",
            "removed_spans",
            "clean_hash",
        )
        .orderBy("doc_id")
    )
