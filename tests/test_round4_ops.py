"""Round-4 training-pipeline operators: blocklist signals, the hashed
linear quality classifier, RAG chunking, PMI collocations, SemDeDup-style
semantic dedup, and the leakage-safe split.

All are north-star additions (no reference counterpart; the reference
stops at per-message streaming analytics — SURVEY.md §2.9). Each test
recomputes the operator's semantics independently in Python on a tiny
explicit fixture, so a regression in the Spark plan can't hide behind
the DuckDB oracle sharing its bug.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

import re

from bigdataminingproject_spark.operators.frequency import pmi_collocations
from bigdataminingproject_spark.operators.packing import chunk_documents
from bigdataminingproject_spark.operators.quality import (
    BLOCKLIST_MAX_BP,
    blocklist_signals,
    linear_quality_score,
)
from bigdataminingproject_spark.operators.sampling import leakage_safe_split
from bigdataminingproject_spark.operators.similarity import semantic_dedup


def tokenize_py(text: str) -> list[str]:
    """Python twin of functions.text.tokenize (lowercase, split on
    non-letter runs, drop empties); fixtures here are ASCII-only."""
    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "src%d" % (i % 2)) for i, t in enumerate(rows)],
        "doc_id long, text string, source string",
    )


# --- blocklist ---------------------------------------------------------------


def test_blocklist_counts_and_flag(spark):
    df = _docs(
        spark,
        [
            "bad bad good good good good good good good good",  # 2/10 = 2000bp
            "clean words only here",  # 0 bp
            "bad worse bad",  # worse not listed: 2/3
            "",
        ],
    )
    out = {
        r["doc_id"]: r
        for r in blocklist_signals(
            df, blocklist=("bad", "worse"), max_bp=1000
        ).collect()
    }
    assert out[0]["blocked_tokens"] == 2
    assert out[0]["blocked_bp"] == 2000
    assert out[0]["keep"] is False
    assert out[1]["blocked_bp"] == 0 and out[1]["keep"] is True
    assert out[2]["blocked_tokens"] == 3  # 'worse' IS listed
    assert out[2]["blocked_bp"] == 10000
    # empty doc: 0 tokens, 0 bp, kept
    assert out[3]["n_tokens"] == 0
    assert out[3]["blocked_bp"] == 0 and out[3]["keep"] is True


def test_blocklist_default_threshold_constant():
    assert 0 < BLOCKLIST_MAX_BP < 10000


# --- hashed linear classifier ------------------------------------------------


def _py_weight(token: str, n_buckets: int = 4096) -> float:
    b = int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n_buckets
    h = int(hashlib.md5(("w" + str(b)).encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def test_linear_quality_score_matches_python(spark):
    texts = ["spark join table", "slow scan dup dup", "", "one"]
    df = _docs(spark, texts)
    out = {r["doc_id"]: r for r in linear_quality_score(df).collect()}
    for i, t in enumerate(texts):
        toks = tokenize_py(t)
        s6 = round(sum(_py_weight(w) for w in toks), 6) if toks else 0.0
        n = max(len(toks), 1)
        m = s6 / n
        assert out[i]["n_tokens"] == len(toks)
        # engine-stable half-up mean (stable_round_div's exact op order)
        assert out[i]["margin"] == pytest.approx(
            math.floor(s6 * 10000.0 / n + 0.5) / 10000.0, abs=1e-12
        )
        assert out[i]["quality_prob"] == pytest.approx(
            round(1.0 / (1.0 + math.exp(-m)), 4), abs=1e-9
        )
    # empty doc scores exactly sigmoid(0)
    assert out[2]["quality_prob"] == 0.5


def test_linear_quality_score_is_layout_invariant(spark):
    df = _docs(spark, [f"tok{i} tok{i+1} spark join" for i in range(40)])
    a = sorted(map(tuple, linear_quality_score(df).collect()))
    b = sorted(map(tuple, linear_quality_score(df.repartition(7)).collect()))
    assert a == b


# --- chunking ----------------------------------------------------------------


def test_chunk_documents_covers_and_overlaps(spark):
    # 70 distinct letter-only tokens (the tokenizer drops digits)
    vocab = [
        f"w{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(70)
    ]
    words = " ".join(vocab)
    df = _docs(spark, [words, "short text", ""])
    rows = chunk_documents(df, chunk_size=32, stride=24).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 70 tokens -> ceil(70/24) = 3 chunks at starts 0, 24, 48
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c0] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in c0] == [32, 32, 22]
    assert c0[0]["chunk_text"].split()[:2] == vocab[:2]
    assert c0[1]["chunk_text"].split()[0] == vocab[24]
    assert c0[2]["chunk_text"].split()[-1] == vocab[69]
    # consecutive chunks overlap by chunk_size - stride = 8 tokens
    assert c0[0]["chunk_text"].split()[24:] == c0[1]["chunk_text"].split()[:8]
    # every token of the doc appears in some chunk (coverage)
    covered = set()
    for r in c0:
        covered.update(r["chunk_text"].split())
    assert covered == set(words.split())
    # doc 1: 2 tokens -> a single short chunk; doc 2: empty -> no rows
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [2]
    assert 2 not in by_doc


def test_chunk_documents_invariants_all_lengths_0_to_80(spark):
    """One Spark job covering every token length 0..80 at (32, 24):
    chunk count is ceil(n/stride); concatenating chunks at stride
    offsets reproduces the doc; the tail chunk is never empty."""
    rows = []
    for n in range(81):
        toks = [f"t{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(n)]
        rows.append((n, " ".join(toks), "src"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = chunk_documents(df, chunk_size=32, stride=24).collect()
    by_doc: dict[int, dict[int, object]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    for n in range(81):
        if n == 0:
            assert n not in by_doc
            continue
        chunks = by_doc[n]
        expect_chunks = -(-n // 24)  # ceil
        assert len(chunks) == expect_chunks, f"n={n}"
        assert set(chunks) == set(range(expect_chunks))
        toks = [f"t{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(n)]
        for idx, r in chunks.items():
            start = idx * 24
            expect = toks[start : start + 32]
            assert r["chunk_text"].split() == expect, f"n={n} idx={idx}"
            assert r["n_chunk_tokens"] == len(expect) > 0


# --- PMI collocations --------------------------------------------------------


def test_pmi_ranks_fixed_phrase_first(spark):
    # "alpha beta" always adjacent (20x); filler tokens are shuffled
    # deterministically so their pairings vary.
    rows = []
    fill = ["red", "green", "blue", "cyan"]
    for i in range(20):
        f = fill[i % 4], fill[(i + 1) % 4], fill[(i + 2) % 4]
        rows.append(f"alpha beta {f[0]} {f[1]} {f[2]}")
    df = _docs(spark, rows)
    out = pmi_collocations(df, k=5, min_count=5).collect()
    assert out[0]["bigram"] == "alpha beta"
    assert out[0]["c_ab"] == 20
    # exact PMI recompute: c_a = c_b = 20, T = 100 tokens, B = 80 bigrams
    expect = round(math.log((20 / 80) / ((20 / 100) * (20 / 100))), 4)
    assert out[0]["pmi"] == pytest.approx(expect, abs=1e-9)
    # min_count prunes anything seen fewer than 5 times
    assert all(r["c_ab"] >= 5 for r in out)


# --- semantic dedup ----------------------------------------------------------


def test_semantic_dedup_drops_near_identical_vectors(spark):
    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + 1e-6 for x in base]  # cosine ~ 1 with base
    far = [-x for x in base]  # cosine -1
    other = [rng.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far), (3, other)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, threshold=0.9)
    rows = {r["dup_id"]: r for r in out.collect()}
    # vec 1 is dropped against representative 0; nothing else is
    assert set(rows) == {1}
    assert rows[1]["rep_id"] == 0
    assert rows[1]["cosine_sim"] >= 0.999
    # the kept corpus via anti-join has exactly 3 vectors
    kept = df.join(out, df.vec_id == out.dup_id, "left_anti")
    assert kept.count() == 3


def test_semantic_dedup_rep_is_best_match(spark):
    import random

    rng = random.Random(11)
    a = [rng.uniform(-1, 1) for _ in range(64)]
    b = [x + 1e-6 for x in a]
    c = [x + 1e-3 * rng.uniform(-1, 1) for x in a]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id long, embedding array<double>"
    )
    rows = {r["dup_id"]: r for r in semantic_dedup(df, threshold=0.9).collect()}
    # 1 and 2 both dup against 0's group; each names its most-similar
    # lower-id vector
    assert set(rows) == {1, 2}
    assert rows[1]["rep_id"] == 0


# --- BPE pair statistics -----------------------------------------------------


def test_bpe_pair_stats_weights_by_word_frequency(spark):
    # "abab" x3 and "abc" x2: pair 'ab' occurs 2/word in abab, 1 in abc
    df = _docs(spark, ["abab abab abab abc abc", "", "xy"])
    from bigdataminingproject_spark.operators.textstats import bpe_pair_stats

    out = {r["pair"]: r for r in bpe_pair_stats(df, k=10).collect()}
    # ab: abab contributes 2 occurrences x freq 3 = 6? No — pairs are
    # positional: 'abab' -> ab, ba, ab => 'ab' twice. 2*3 + 1*2 = 8
    assert out["ab"]["pair_count"] == 2 * 3 + 1 * 2
    assert out["ab"]["n_words"] == 2  # distinct words, not occurrences
    assert out["ba"]["pair_count"] == 1 * 3
    assert out["bc"]["pair_count"] == 1 * 2
    assert out["xy"]["pair_count"] == 1
    # single-char words contribute nothing; ordering is count desc
    rows = bpe_pair_stats(df, k=10).collect()
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


# --- label centroid stats ----------------------------------------------------


def test_label_centroid_stats_exact_on_tiny_fixture(spark):
    # two labels; label 0's two vectors are symmetric about the axis so
    # the centroid is (1,0,...) scaled; cohesion is cos(45deg)
    import math as _m

    a = [1.0, 1.0] + [0.0] * 62
    b = [1.0, -1.0] + [0.0] * 62
    c = [0.0, 3.0] + [0.0] * 62
    df = spark.createDataFrame(
        [(0, a, 0), (1, b, 0), (2, c, 1)],
        "vec_id long, embedding array<double>, label int",
    )
    from bigdataminingproject_spark.operators.similarity import (
        label_centroid_stats,
    )

    out = {r["label"]: r for r in label_centroid_stats(df).collect()}
    # label 0 centroid = (1, 0, ...): norm 1; cos(v, c) = 1/sqrt(2)
    assert out[0]["n_vectors"] == 2
    assert out[0]["centroid_norm"] == pytest.approx(1.0, abs=1e-9)
    assert out[0]["mean_cos"] == pytest.approx(
        round(1 / _m.sqrt(2), 4), abs=1e-4
    )
    # label 1: singleton cluster — cohesion exactly 1
    assert out[1]["n_vectors"] == 1
    assert out[1]["centroid_norm"] == pytest.approx(3.0, abs=1e-9)
    assert out[1]["mean_cos"] == pytest.approx(1.0, abs=1e-9)


# --- streaming compatibility of the stateless round-4 signals ---------------


def test_blocklist_and_chunker_run_on_streams(spark, sf_dir, tmp_path):
    """blocklist_signals and chunk_documents are stateless projections,
    so the SAME operator code runs unchanged on a Structured Streaming
    source and matches its batch output (drop the presentation orderBy,
    which append-mode streams disallow — at 100 TB that's the shape
    you'd deploy anyway)."""
    from bigdataminingproject_spark.sources.tables import load_table
    from bigdataminingproject_spark.streaming.pipeline import run_to_memory
    from bigdataminingproject_spark.streaming.replay import (
        file_replay_source,
    )

    docs = load_table(spark, sf_dir, "documents")
    stream = file_replay_source(
        spark, docs, str(tmp_path / "r4stream"), chunks=4, files_per_trigger=2
    )
    for op, sink in (
        (blocklist_signals, "bl_stream"),
        (chunk_documents, "ck_stream"),
    ):
        run_to_memory(
            op(stream, ordered=False), sink, output_mode="append"
        )
        got = spark.table(sink)
        expect = op(docs, ordered=False)
        assert got.count() == expect.count()
        assert (
            got.exceptAll(expect).count() == 0
            and expect.exceptAll(got).count() == 0
        )


# --- corpus data card --------------------------------------------------------


def test_corpus_datacard_exact_on_fixture(spark):
    import math as _m

    from bigdataminingproject_spark.plans.report import corpus_datacard

    rows = [
        # srcA: 3 docs, 2 langs (2 en / 1 de), one exact dup pair
        (0, "alpha beta", "en", "srcA"),
        (1, "alpha beta", "en", "srcA"),
        (2, "gamma delta epsilon", "de", "srcA"),
        # srcB: 1 doc, 1 lang, no dups
        (3, "zeta", "fr", "srcB"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["source"]: r for r in corpus_datacard(df).collect()}
    a = out["srcA"]
    assert a["n_docs"] == 3 and a["n_tokens"] == 7 and a["n_langs"] == 2
    assert a["dup_docs"] == 1
    # H = ln(3) - (2 ln 2 + 1 ln 1)/3
    assert a["lang_entropy"] == pytest.approx(
        round(_m.log(3) - (2 * _m.log(2)) / 3, 4), abs=1e-9
    )
    assert a["mean_doc_tokens"] == pytest.approx(2.33, abs=1e-9)
    b = out["srcB"]
    assert b["n_docs"] == 1 and b["lang_entropy"] == 0.0
    assert b["dup_docs"] == 0 and b["mean_doc_tokens"] == 1.0


# --- hybrid retrieval (RRF) --------------------------------------------------


def test_rrf_fuse_math_and_outer_semantics(spark):
    from bigdataminingproject_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse({"lex": lex, "vec": vec}, k=10).collect()}
    # doc 11 appears in both systems: 1/62 + 1/61
    assert out[11]["rrf"] == pytest.approx(round(1 / 62 + 1 / 61, 6), abs=1e-9)
    assert out[11]["rank_lex"] == 2 and out[11]["rank_vec"] == 1
    # single-system docs get one reciprocal and a null other-rank
    assert out[10]["rrf"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert out[10]["rank_vec"] is None
    assert out[13]["rank_lex"] is None
    # both-systems doc outranks every single-system doc
    ordered = sorted(out.values(), key=lambda r: -r["rrf"])
    assert ordered[0]["doc_id"] == 11


def test_hybrid_search_composes_both_legs(spark, sf_dir):
    from bigdataminingproject_spark.operators.retrieval import (
        HYBRID_QUERY_TERMS,
        HYBRID_QUERY_VEC,
        hybrid_search,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    rows = hybrid_search(
        docs, vecs, HYBRID_QUERY_TERMS, HYBRID_QUERY_VEC, k=10
    ).collect()
    assert len(rows) == 10
    # fused ordering is (rrf desc, doc_id); every row cites at least
    # one leg; the query vector itself is never a result
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(
        r["rank_lex"] is not None or r["rank_vec"] is not None for r in rows
    )
    assert all(r["doc_id"] != HYBRID_QUERY_VEC or r["rank_lex"] for r in rows)


# --- leakage-safe split ------------------------------------------------------


def test_leakage_split_keeps_duplicates_on_one_side(spark):
    # 30 distinct texts, each duplicated 3x under different doc_ids
    rows = []
    did = 0
    for g in range(30):
        for _ in range(3):
            rows.append((did, f"text body number {g}", "src0"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # per-doc side assignment recomputed from the operator's definition
    def side(text: str) -> str:
        gk = hashlib.md5(text.encode()).hexdigest()
        u = int(hashlib.md5(gk.encode()).hexdigest()[:8], 16) / 2**32
        return "train" if u < 0.9 else "val"

    expected: dict[str, list[int]] = {"train": [], "val": []}
    for i, t, _ in rows:
        expected[side(t)].append(i)
    out = {r["split"]: r for r in leakage_safe_split(df).collect()}
    for sp in ("train", "val"):
        if not expected[sp]:
            assert sp not in out
            continue
        assert out[sp]["n_docs"] == len(expected[sp])
        assert out[sp]["id_checksum"] == sum(expected[sp])
        # dup groups of 3 never straddle: doc count is a multiple of 3
        assert out[sp]["n_docs"] % 3 == 0
        assert out[sp]["n_groups"] == out[sp]["n_docs"] // 3


# --- span-level exact-substring dedup ---------------------------------------


def _span_docs(spark, rows):
    return spark.createDataFrame(
        list(enumerate(rows)), "doc_id long, text string"
    )


def test_span_dedup_removes_later_copies_only(spark):
    from bigdataminingproject_spark.operators.dedup import span_dedup

    span = "a b c d"  # W=4 -> exactly one span
    docs = _span_docs(
        spark,
        [
            span,                      # doc 0: first occurrence, kept
            span,                      # doc 1: later copy, removed
            span + " x y z w",         # doc 2: copy + unique tail span
        ],
    )
    out = {
        r["doc_id"]: r
        for r in span_dedup(docs, span_tokens=4).collect()
    }
    assert out[0]["kept_spans"] == 1 and out[0]["removed_spans"] == 0
    assert out[1]["kept_spans"] == 0 and out[1]["removed_spans"] == 1
    assert out[2]["kept_spans"] == 1 and out[2]["removed_spans"] == 1
    assert out[2]["kept_tokens"] == 4
    # doc 1 rebuilds to the empty string
    import hashlib

    assert out[1]["clean_hash"] == hashlib.md5(b"").hexdigest()
    # doc 2 rebuilds to its unique tail
    assert (
        out[2]["clean_hash"]
        == hashlib.md5(b"x y z w").hexdigest()
    )


def test_span_dedup_short_and_empty_docs(spark):
    from bigdataminingproject_spark.operators.dedup import span_dedup

    docs = _span_docs(spark, ["", "solo", "solo"])
    rows = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=8).collect()}
    # empty text -> zero spans -> the doc drops out of the span relation
    assert 0 not in rows
    # a sub-width doc still forms one (short) span; the second copy dedups
    assert rows[1]["kept_spans"] == 1
    assert rows[2]["removed_spans"] == 1


def test_span_dedup_first_occurrence_is_stream_order(spark):
    from bigdataminingproject_spark.operators.dedup import span_dedup

    # same span appears twice inside ONE doc: position order decides
    docs = _span_docs(spark, ["p q r s p q r s"])
    row = span_dedup(docs, span_tokens=4).collect()[0]
    assert row["n_spans"] == 2
    assert row["kept_spans"] == 1 and row["removed_spans"] == 1


# --- token co-occurrence PageRank -------------------------------------------


def test_pagerank_hub_ranks_first(spark):
    """A star graph: the hub token adjacent to every spoke must out-rank
    all spokes."""
    from bigdataminingproject_spark.operators.frequency import (
        token_pagerank,
    )

    docs = _docs(
        spark,
        [
            "hub alpha",
            "hub beta",
            "hub gamma",
            "hub delta",
            "hub epsilon",
        ],
    )
    out = token_pagerank(docs, iters=3, top_n=10).collect()
    assert out[0]["token"] == "hub"
    assert out[0]["rank"] == 1
    # spokes are symmetric: identical pr, ranked alphabetically
    spokes = [r for r in out if r["token"] != "hub"]
    assert len({r["pr"] for r in spokes}) == 1
    assert [r["token"] for r in spokes] == sorted(r["token"] for r in spokes)


def test_pagerank_mass_is_conserved(spark, sf_dir):
    """Total PageRank over the full vocabulary stays ~1 after any number
    of iterations (symmetrized graph has no dangling leak)."""
    from bigdataminingproject_spark.operators.frequency import (
        token_pagerank,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = token_pagerank(docs, iters=3, top_n=10_000).collect()
    assert abs(sum(r["pr"] for r in out) - 1.0) < 1e-6


def test_pagerank_empty_corpus(spark):
    from bigdataminingproject_spark.operators.frequency import (
        token_pagerank,
    )

    docs = _docs(spark, ["solo"])  # one token -> no bigrams -> no graph
    assert token_pagerank(docs).count() == 0


# --- source divergence (KL / JSD drift monitor) ------------------------------


def test_divergence_zero_for_identical_sources(spark):
    """Two sources with identical token distributions: KL and JSD are 0."""
    from bigdataminingproject_spark.operators.textstats import (
        source_divergence,
    )

    rows = [
        (0, "alpha beta gamma", "a"),
        (1, "alpha beta gamma", "b"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {r["source"]: r for r in source_divergence(docs).collect()}
    assert out["a"]["kl_vs_corpus"] == 0.0
    assert out["a"]["jsd_vs_corpus"] == 0.0
    assert out["b"]["kl_vs_corpus"] == 0.0


def test_divergence_orders_drifted_source_higher(spark):
    """A source with a disjoint vocabulary diverges more than one that
    matches the corpus majority."""
    from bigdataminingproject_spark.operators.textstats import (
        source_divergence,
    )

    rows = [
        (0, "alpha beta alpha beta", "majority"),
        (1, "alpha beta alpha beta", "majority2"),
        (2, "zeta theta zeta theta", "drifted"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {r["source"]: r for r in source_divergence(docs).collect()}
    assert out["drifted"]["kl_vs_corpus"] > out["majority"]["kl_vs_corpus"]
    assert out["drifted"]["jsd_vs_corpus"] > out["majority"]["jsd_vs_corpus"]
    # JSD is bounded by ln(2)
    assert out["drifted"]["jsd_vs_corpus"] <= 0.6931 + 1e-6
    assert out["drifted"]["vocab_size"] == 2
    assert out["drifted"]["n_tokens"] == 4


# --- hard-negative mining ----------------------------------------------------


def test_hard_negatives_lexical_hits_semantic_misses(spark):
    """Docs sharing the query's terms but with opposite embeddings must
    surface as the hardest negatives; the semantically-near doc must
    not."""
    from bigdataminingproject_spark.operators.retrieval import (
        hard_negatives,
    )

    docs = spark.createDataFrame(
        [
            (0, "join vector stream query", "s"),   # the query doc
            (1, "join vector stream table", "s"),   # lexical + semantic near
            (2, "join vector stream scan", "s"),    # lexical, semantic FAR
            (3, "unrelated words entirely", "s"),   # no lexical overlap
        ],
        "doc_id long, text string, source string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.1]),
            (2, [-1.0, 0.0]),
            (3, [0.9, 0.2]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hard_negatives(
        docs, vecs, ["join", "vector", "stream"], 0, k_lex=10, n_neg=2
    ).collect()
    # doc 2: lexically retrieved, cosine -1 -> hardest negative first
    assert out[0]["doc_id"] == 2
    assert out[0]["cosine_sim"] == -1.0
    assert out[0]["neg_rank"] == 1
    # doc 3 never enters (BM25 leg excludes it); query doc excluded
    ids = {r["doc_id"] for r in out}
    assert 3 not in ids and 0 not in ids


# --- corpus snapshot diff ----------------------------------------------------


def test_corpus_diff_statuses(spark):
    from bigdataminingproject_spark.plans.report import corpus_diff

    old = _docs(spark, ["alpha", "beta", "gamma"])
    new = spark.createDataFrame(
        [
            (0, "alpha", "s"),          # unchanged -> absent
            (1, "beta CHANGED", "s"),   # changed
            (3, "delta", "s"),          # added
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {1: "changed", 2: "removed", 3: "added"}


def test_corpus_diff_identical_is_empty(spark):
    from bigdataminingproject_spark.plans.report import corpus_diff

    docs = _docs(spark, ["a", "b"])
    assert corpus_diff(docs, docs).count() == 0


# --- degenerate corpora through the third-batch operators --------------------


def test_third_batch_ops_edge_cases(spark):
    """Empty text, single-token docs, unicode tokens, and a single-user
    event log through every round-4 third-batch text/event operator:
    no crashes, correct exclusions."""
    from bigdataminingproject_spark.operators.dedup import span_dedup
    from bigdataminingproject_spark.operators.frequency import (
        token_pagerank,
    )
    from bigdataminingproject_spark.operators.quality import gopher_gate
    from bigdataminingproject_spark.operators.sampling import apply_mixture
    from bigdataminingproject_spark.operators.textstats import (
        source_divergence,
    )
    from bigdataminingproject_spark.plans.report import corpus_diff
    from pyspark.sql import functions as F

    rows = [
        (0, "", "a"),
        (1, "solo", "a"),
        (2, "héllo wörld héllo wörld café", "b"),
        (3, "the the the the the the the the the the", "b"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    # span dedup: empty doc absent, others present
    sd = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=4).collect()}
    assert 0 not in sd and set(sd) == {1, 2, 3}
    # pagerank: graph exists only from docs with >= 2 surviving tokens;
    # unicode tokens survive \p{L} tokenization
    pr = token_pagerank(docs, iters=2, top_n=50).collect()
    assert {r["token"] for r in pr} >= {"héllo", "wörld"}
    # divergence: every source present incl. the one with an empty doc
    dv = {r["source"]: r for r in source_divergence(docs).collect()}
    assert set(dv) == {"a", "b"}
    assert dv["a"]["n_tokens"] == 1  # '' contributes nothing, 'solo' one
    # gopher gate: empty doc absent (no tokens), spam doc dropped
    gg = {r["doc_id"]: r for r in gopher_gate(docs).collect()}
    assert 0 not in gg
    assert gg[3]["keep"] is False
    # mixture executor: a single-source corpus is the identity plan
    # (rate exactly 10000 bp -> one copy each, nobody dropped)
    one_src = docs.withColumn("source", F.lit("only"))
    am = apply_mixture(one_src, F.lit(1)).collect()
    assert {r["n_copies"] for r in am} == {1}
    assert len(am) == 4
    # corpus diff: one side empty -> everything 'removed'
    empty = docs.filter("doc_id < 0")
    cd = corpus_diff(docs, empty).collect()
    assert len(cd) == 4 and all(r["status"] == "removed" for r in cd)


def test_third_batch_event_ops_single_user(spark):
    """A one-user, one-event log through cohort/scd2/funnel-latency:
    minimal but well-formed outputs."""
    import datetime

    from bigdataminingproject_spark.operators.events import (
        cohort_triangle,
        funnel_latency,
        scd2_history,
    )

    t = datetime.datetime
    ev = spark.createDataFrame(
        [(1, t(2024, 1, 1), 9, "signup", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ct = cohort_triangle(ev).collect()
    assert len(ct) == 1 and ct[0]["retention_rate"] == 1.0
    h = scd2_history(ev).collect()
    assert len(h) == 1 and h[0]["valid_to_us"] is None
    fl = {r["transition"]: r for r in funnel_latency(ev).collect()}
    assert fl["signup->click"]["n_reached"] == 1
    assert fl["signup->click"]["n_converted"] == 0
    assert fl["signup->click"]["p50_latency_s"] is None


def test_mmr_rerank_prefers_diversity(spark):
    """MMR semantics on a crafted pool: the second-most-relevant
    candidate is a near-clone of the first pick, so MMR demotes it
    below a less-relevant-but-distinct candidate; a brute-force greedy
    recompute pins every (rank, id, score)."""
    import itertools
    import math

    from bigdataminingproject_spark.operators.retrieval import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),            # query
        (1, [0.99, 0.141, 0.0, 0.0]),         # highly relevant
        (2, [0.985, 0.17, 0.0, 0.0]),         # near-clone of 1
        (3, [0.975, -0.2222, 0.0, 0.0]),      # nearly as relevant,
        #   noise anti-aligned with 1's -> low enough mutual sim that
        #   MMR at lambda=0.7 promotes it over the clone
        (4, [0.6, 0.0, 0.0, 0.8]),            # less relevant, distinct
        (5, [0.1, 0.99, 0.0, 0.0]),           # barely relevant
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(
        df, df.filter("vec_id = 0"), k=4, pool=5, lam=0.7
    ).collect()

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return round(num / den, 6)

    vec = dict(rows)
    cands = sorted(
        ((cos(vec[0], vec[i]), i) for i in range(1, 6)),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    rel = {i: r for r, i in cands}
    selected, expect = [], []
    for rank in range(1, 5):
        best = None
        for i in rel:
            if i in selected:
                continue
            if not selected:
                score = rel[i]
            else:
                ms = max(cos(vec[i], vec[s]) for s in selected)
                score = round(0.7 * rel[i] - (1.0 - 0.7) * ms, 6) + 0.0
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, score)
        selected.append(best[1])
        expect.append((0, rank, best[1], best[2]))
    got = [
        (r["query_id"], r["mmr_rank"], r["neighbor_id"], r["mmr_score"])
        for r in out
    ]
    assert got == expect
    # the crafted near-clone (id 2) must NOT hold rank 2 despite being
    # the 2nd-most-relevant — diversity demoted it
    assert got[1][2] != 2
    assert 2 in [g[2] for g in got]  # but it is still selected later


def test_lttb_downsample_keeps_peaks_and_endpoints(spark):
    """Fixed-anchor LTTB on a crafted series: the interior spike (the
    point a per-bucket mean would flatten) must be the bucket's
    representative, and the first/last buckets pin the series
    endpoints."""
    from datetime import datetime, timedelta

    from bigdataminingproject_spark.operators.events import lttb_downsample

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        # flat series at 1.0 except a spike at i=17 (bucket 2 of 4)
        rows.append(
            (i, t0 + timedelta(minutes=i), 100.0 if i == 17 else 1.0)
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    )
    out = {r["bucket"]: r for r in lttb_downsample(df, 4).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0]["event_id"] == 0       # first point pinned
    assert out[3]["event_id"] == 39      # last point pinned
    assert out[1]["event_id"] == 17      # the spike survives
    assert out[1]["value"] == 100.0


def test_lttb_downsample_sparse_neighbor_buckets(spark):
    """ADVICE r5 regression: with equal-width time buckets a clustered
    series leaves interior buckets with EMPTY neighbors; the neighbor
    means must left-join with an own-bucket-mean fallback so the bucket
    still emits a representative (inner joins silently dropped it)."""
    from datetime import datetime, timedelta

    from bigdataminingproject_spark.operators.events import lttb_downsample

    t0 = datetime(2024, 1, 1)
    # minutes 0,1 -> bucket 0; 22,23 -> bucket 2; 49 -> bucket 4 (=bmax)
    # buckets 1 and 3 are empty, so bucket 2 has no live neighbors.
    rows = [
        (0, t0, 1.0),
        (1, t0 + timedelta(minutes=1), 2.0),
        (22, t0 + timedelta(minutes=22), 5.0),
        (23, t0 + timedelta(minutes=23), 7.0),
        (49, t0 + timedelta(minutes=49), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    )
    out = {r["bucket"]: r for r in lttb_downsample(df, 5).collect()}
    # every non-empty bucket keeps a representative
    assert sorted(out) == [0, 2, 4]
    assert out[0]["event_id"] == 0
    assert out[4]["event_id"] == 49
    # degenerate triangles (both anchors fall back to the own-bucket
    # mean) tie at zero area -> deterministic min-event_id winner
    assert out[2]["event_id"] == 22
