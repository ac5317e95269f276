"""Dedup operator semantics against hand-computed oracles (reference A10:
duplicate_detector.py:44-61 check-then-insert, first-occurrence exclusion)."""

from __future__ import annotations

import pytest

from bigdataminingproject_spark.operators.dedup import (
    duplicate_scores,
    exact_duplicates,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta"),  # first occurrence — never flagged
        (1, "alpha beta gamma delta"),  # exact repeat → score 1.0
        (2, "alpha beta gamma zeta"),  # shares 'alpha beta gamma' (1 of 2)
        (3, "one two"),  # <3 tokens → no shingles → 0.0
        (4, "totally different words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_never_flagged(spark, docs):
    out = {r["doc_id"]: r for r in duplicate_scores(docs).collect()}
    assert out[0]["duplicate_score"] == 0.0
    assert not out[0]["is_duplicate"]


def test_exact_repeat_scores_one(spark, docs):
    out = {r["doc_id"]: r for r in duplicate_scores(docs).collect()}
    assert out[1]["duplicate_score"] == 1.0
    assert out[1]["is_duplicate"]


def test_partial_overlap_below_threshold(spark, docs):
    # doc 2 shingles: 'alpha beta gamma' (seen), 'beta gamma zeta' (new) → 0.5
    out = {r["doc_id"]: r for r in duplicate_scores(docs).collect()}
    assert out[2]["duplicate_score"] == 0.5
    assert not out[2]["is_duplicate"]


def test_short_doc_scores_zero(spark, docs):
    out = {r["doc_id"]: r for r in duplicate_scores(docs).collect()}
    assert out[3]["duplicate_score"] == 0.0


def test_exact_duplicates_groups_normalized(spark):
    rows = [
        (0, "Hello   World"),
        (1, "hello world"),
        (2, "different"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_duplicates(df).collect()
    assert len(groups) == 1
    assert groups[0]["group_size"] == 2
    assert groups[0]["keeper_id"] == 0
    assert groups[0]["member_ids"] == [0, 1]


def test_ngram_jaccard_exact_pair(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical shingle sets
    # docs 0 and 2: share 1 of 3 distinct shingles → 1/3
    assert pairs[(0, 2)] == round(1 / 3, 4)


def _bruteforce_jaccard(rows, threshold, k=3):
    """Python all-pairs oracle with the operator's tokenize/shingle rules."""
    import re

    sets = {}
    for doc_id, text in rows:
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        sets[doc_id] = {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            j = round(inter / union, 4)
            if j >= threshold:
                out[(a, b)] = j
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_ngram_jaccard_prefix_filter_matches_bruteforce(spark, threshold):
    """The prefix+length filter must lose no qualifying pair (PPJoin
    guarantee) on a randomized corpus with heavy shingle sharing."""
    import random

    rng = random.Random(42)
    vocab = ["w%d" % i for i in range(12)]
    rows = []
    for doc_id in range(80):
        n = rng.randint(1, 12)  # includes <k-token docs (empty sets)
        rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    assert got == _bruteforce_jaccard(rows, threshold)
