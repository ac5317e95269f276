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
