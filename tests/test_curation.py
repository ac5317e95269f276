"""End-to-end corpus curation: quality gate → exact dedup → near-dup
prune, with a deterministic audit trail."""

from __future__ import annotations

import pytest

from bigdataminingproject_spark.plans.curation import curate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    long_a = "the quick brown fox jumps over the lazy dog near the river today"
    rows = [
        (0, long_a),
        (1, long_a),  # exact duplicate of 0 → dropped
        (2, long_a.replace("river", "ocean")),  # near-dup of 0 → dropped
        (3, "tiny"),  # < 5 tokens → quality-gated
        (4, "a completely different document about spark physical planning"),
        (5, "THE  QUICK brown fox jumps over the lazy dog near the river today"),
        # 5 normalizes to a different string (case/whitespace differ) but is
        # an exact dup after normalization → dropped by exact stage
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_stages_and_keepers(spark, corpus):
    curated, stats = curate_corpus(corpus, neardup_threshold=0.6)
    kept = sorted(r["doc_id"] for r in curated.collect())
    assert kept == [0, 4]  # min-id keeper survives each family
    assert stats["input_docs"] == 6
    assert stats["dropped"]["low_quality"] == 1  # doc 3
    assert stats["dropped"]["exact_duplicates"] == 2  # docs 1, 5
    assert stats["dropped"]["near_duplicates"] == 1  # doc 2
    assert stats["retention_rate"] == round(2 / 6, 4)


def test_curation_is_deterministic(spark, corpus):
    a, sa = curate_corpus(corpus, neardup_threshold=0.6)
    b, sb = curate_corpus(corpus, neardup_threshold=0.6)
    assert sa == sb
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_curation_on_real_documents(spark, sf_dir):
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    curated, stats = curate_corpus(docs, neardup_threshold=0.9)
    assert stats["input_docs"] == 500
    assert stats["after_neardup_prune"] == curated.count()
    assert 0 < stats["retention_rate"] <= 1.0


def test_curate_v2_composition_matches_stagewise(spark, sf_dir):
    """The composed v2 pipeline must equal the three stage operators
    applied independently: domain cap, winnowing clone prune over the
    capped survivors, and the corpus-wide mean+2sd surprisal cut."""
    import statistics

    from bigdataminingproject_spark.operators.quality import (
        unigram_logprob,
        winnow_pairs,
    )
    from bigdataminingproject_spark.operators.sampling import domain_cap
    from bigdataminingproject_spark.plans.curation import (
        curate_corpus_v2,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    capped = {
        r["doc_id"] for r in domain_cap(docs, cap=40).select("doc_id").collect()
    }
    kept = docs.filter(docs.doc_id.isin(list(capped)))
    losers = {
        r["id_b"] for r in winnow_pairs(kept, min_shared=2).collect()
    }
    nll = {
        r["doc_id"]: r["nll"] for r in unigram_logprob(docs).collect()
    }
    # the composed plan rounds the cut to the 4dp nll quantum (parity
    # with the oracle) — mirror that here
    cut = round(
        statistics.mean(nll.values()) + 2 * statistics.stdev(nll.values()),
        4,
    )
    expected = {
        d for d in capped - losers if d in nll and nll[d] <= cut
    }
    got = {
        r["doc_id"]
        for r in curate_corpus_v2(docs, cap_per_source=40).collect()
    }
    assert got == expected and got


def test_curate_v3_composition_matches_stagewise(spark, sf_dir):
    """The full-gate v3 pipeline must equal its stages applied
    independently: decontaminate -> curate_corpus_v2 over the clean
    corpus -> PII redaction of the survivors."""
    from bigdataminingproject_spark.operators.quality import (
        decontaminate,
        pii_redact,
        synthetic_pii_text,
    )
    from bigdataminingproject_spark.plans.curation import (
        curate_corpus_v2,
        curate_corpus_v3,
    )
    from bigdataminingproject_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)

    flagged = {
        r["doc_id"]
        for r in decontaminate(train, bench, k=4)
        .filter("contaminated = 1")
        .collect()
    }
    clean = train.filter(~train.doc_id.isin(list(flagged)))
    v2_rows = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["nll"])
        for r in curate_corpus_v2(clean).collect()
    }
    red_rows = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ip"])
        for r in pii_redact(
            train.select("doc_id", synthetic_pii_text().alias("text")),
            "text",
        ).collect()
    }
    expected = {
        d: v2_rows[d] + red_rows[d] for d in v2_rows
    }

    got_df = curate_corpus_v3(
        train, bench, redact_text=synthetic_pii_text()
    )
    got = {
        r["doc_id"]: (
            r["source"],
            r["n_tokens"],
            r["nll"],
            r["n_email"],
            r["n_phone"],
            r["n_ip"],
        )
        for r in got_df.collect()
    }
    assert got == expected and got
    # the synthetic augmentation guarantees the PII stage is non-vacuous
    assert all(r[3] >= 1 and r[4] >= 1 and r[5] >= 1 for r in got.values())


def test_curate_v3_drops_contaminated_docs(spark):
    """A doc verbatim-sharing a 4-shingle with the benchmark never
    survives, even if it would pass every other stage."""
    from bigdataminingproject_spark.plans.curation import curate_corpus_v3

    leak = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        (1, "src0", leak + " extra tail words here for length"),
        (2, "src0", "completely unrelated words about spark planning"),
        (3, "src1", "another clean document talking about benchmarks"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    bench = spark.createDataFrame(
        [(100, "bench", leak)], "doc_id long, source string, text string"
    )
    kept = {
        r["doc_id"] for r in curate_corpus_v3(docs, bench, nll_sigma=50.0).collect()
    }
    assert 1 not in kept
    assert {2, 3} <= kept


def test_curate_v4_composition_matches_stagewise(spark, sf_dir):
    """v4 must equal v3 minus the semantic drop list, annotated with the
    span-dedup accounting — each layer applied independently."""
    from bigdataminingproject_spark.operators.dedup import span_dedup
    from bigdataminingproject_spark.operators.quality import (
        synthetic_pii_text,
    )
    from bigdataminingproject_spark.operators.similarity import (
        semantic_dedup,
    )
    from bigdataminingproject_spark.plans.curation import (
        curate_corpus_v3,
        q_corpus_curation_v4,
    )
    from bigdataminingproject_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    vecs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 25 != 0
    )

    v3_ids = {
        r["doc_id"]
        for r in curate_corpus_v3(
            train, bench, redact_text=synthetic_pii_text()
        ).collect()
    }
    sem_drops = {r["dup_id"] for r in semantic_dedup(vecs).collect()}
    spans = {
        r["doc_id"]: (r["kept_spans"], r["removed_spans"], r["clean_hash"])
        for r in span_dedup(train, span_tokens=16).collect()
    }

    v4 = q_corpus_curation_v4(spark, sf_dir).collect()
    assert {r["doc_id"] for r in v4} == v3_ids - sem_drops
    for r in v4:
        exp = spans.get(r["doc_id"])
        got = (r["kept_spans"], r["removed_spans"], r["clean_hash"])
        assert got == (exp if exp else (None, None, None))


def test_curate_v4_semantic_layer_not_vacuous(spark, sf_dir):
    """The embedding layer must actually drop something the lexical
    layers kept (otherwise the composition test proves nothing)."""
    from bigdataminingproject_spark.operators.similarity import (
        semantic_dedup,
    )
    from bigdataminingproject_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    vecs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 25 != 0
    )
    assert semantic_dedup(vecs).count() > 0


def test_incremental_merge_equals_full(spark):
    """curate_corpus_increment(state(A), B) must equal the full v1
    pipeline on A ∪ B — including the tricky memberships: a delta
    exact-dup of a snapshot doc, a delta near-dup of a snapshot
    near-dup LOSER (state rows that are themselves dropped still prune
    new arrivals, as in the full pipeline), a delta-internal dup pair,
    and a genuinely new doc."""
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.plans.curation import (
        curate_corpus_increment,
        curation_state,
    )

    base = "the quick brown fox jumps over the lazy dog near the river today"
    snap_rows = [
        (0, base),
        (1, base.replace("river", "ocean")),  # near-dup loser to 0
        (2, "a completely different document about spark physical planning"),
        (3, "tiny"),  # quality-gated out of the snapshot
    ]
    delta_rows = [
        (10, base.upper()),  # exact dup of 0 after normalization
        (11, base.replace("river", "ocean").replace("today", "tonight")),
        # 11: near-dup of snapshot near-dup LOSER 1 → must still drop
        (12, "fresh prose with entirely novel content and nothing shared"),
        (13, "fresh prose with entirely novel content and nothing shared"),
        # 13: delta-internal exact dup of 12
        (14, "short"),  # quality-gated delta doc
    ]
    snap = spark.createDataFrame(snap_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")
    full = spark.createDataFrame(
        snap_rows + delta_rows, "doc_id long, text string"
    )

    merged = curate_corpus_increment(
        curation_state(snap, neardup_threshold=0.5),
        delta,
        neardup_threshold=0.5,
    )
    inc_kept = sorted(
        r["doc_id"]
        for r in merged.filter(F.col("dropped_neardup") == 0).collect()
    )

    full_state = curation_state(full, neardup_threshold=0.5)
    full_kept = sorted(
        r["doc_id"]
        for r in full_state.filter(F.col("dropped_neardup") == 0).collect()
    )
    assert inc_kept == full_kept
    # the full state relation itself must match row-for-row (flags too)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full_state.collect())
    )
    # and the scenario actually exercised every edge
    assert 11 not in inc_kept and 10 not in inc_kept and 13 not in inc_kept
    assert 12 in inc_kept


def test_incremental_query_matches_full_query(spark, sf_dir):
    """q_corpus_curation_incremental's kept ids == q_corpus_curation's
    on the same table (the Spark-vs-Spark half of merge==full; the
    driver row is the cross-engine half)."""
    from bigdataminingproject_spark.plans.curation import (
        q_corpus_curation,
        q_corpus_curation_incremental,
    )

    inc = q_corpus_curation_incremental(spark, sf_dir).collect()
    full = q_corpus_curation(spark, sf_dir).collect()
    assert [r["doc_id"] for r in inc] == [r["doc_id"] for r in full]
    assert any(r["is_new"] == 1 for r in inc)
    assert any(r["is_new"] == 0 for r in inc)


def test_delta_state_with_persisted_shingle_index_is_identical(spark):
    """Round 6: the append-only streaming twin feeds the PPJoin probe
    side from a persisted (doc_id, shingle_h) index instead of
    re-shingling state text. The index path must be bit-identical to
    the recompute path — same keepers, same dropped flags."""
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.dedup import shingle_relation
    from bigdataminingproject_spark.plans.curation import (
        curate_delta_state,
        curation_state,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six seven"),
            (10, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (11, "alpha beta gamma delta epsilon theta"),  # near-dup
            (12, "totally different words appear here instead now"),
        ],
        "doc_id long, text string",
    )
    state = curation_state(docs.filter(F.col("doc_id") <= 3))
    delta = docs.filter(F.col("doc_id") > 3)
    recompute = curate_delta_state(state, delta)
    indexed = curate_delta_state(
        state, delta, state_shingles=shingle_relation(state)
    )
    assert sorted(map(tuple, recompute.collect())) == sorted(
        map(tuple, indexed.collect())
    )
    # scenario sanity: the near-dup was actually dropped via the index
    flags = {r["doc_id"]: r["dropped_neardup"] for r in indexed.collect()}
    assert flags[11] == 1 and flags[12] == 0 and 10 not in flags
