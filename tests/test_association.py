"""Association-rule mining: hand-computed support/confidence/lift on
explicit baskets, the Apriori prune, and threshold edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.association import (
    association_rules,
    token_baskets,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, item: string")


def test_rules_exact_metrics(spark):
    # 4 baskets: {a,b} {a,b} {a,c} {b}
    # item_n: a=3, b=3, c=1; pair (a,b)=2, (a,c)=1
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            _baskets(spark, rows), min_support=0.5, min_confidence=0.0
        ).collect()
    }
    # min_count = 2 -> only pair (a,b) survives; both directions
    assert set(out) == {("a", "b"), ("b", "a")}
    r = out[("a", "b")]
    assert r.pair_support == 2
    assert r.confidence == pytest.approx(0.6667)  # 2/3 half-up 4dp
    # lift = 2*4 / (3*3) = 0.8889
    assert r.lift == pytest.approx(0.8889)
    assert out[("b", "a")].confidence == pytest.approx(0.6667)


def test_apriori_prune_blocks_infrequent_items(spark):
    # c appears once; with min_support=0.5 over 2 baskets (min_count=1)
    # everything passes, but with min_support=1.0 (min_count=2) c's
    # pairs must never be formed even though (a,c) co-occurs
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    out = association_rules(
        _baskets(spark, rows), min_support=1.0, min_confidence=0.0
    ).collect()
    assert {(r.antecedent, r.consequent) for r in out} == {
        ("a", "b"), ("b", "a")
    }


def test_confidence_floor_is_directional(spark):
    # a in 4 baskets, b in 1, pair in 1: conf(a->b)=0.25 cut,
    # conf(b->a)=1.0 kept
    rows = [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (4, "a")]
    out = association_rules(
        _baskets(spark, rows), min_support=0.25, min_confidence=0.5
    ).collect()
    assert [(r.antecedent, r.consequent) for r in out] == [("b", "a")]
    assert out[0].lift == pytest.approx(1.0)  # 1*4/(1*4)


def test_token_baskets_distinct_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta")], "doc_id: long, text: string"
    )
    rows = token_baskets(docs).collect()
    assert sorted((r.doc_id, r.item) for r in rows) == [
        (1, "alpha"), (1, "beta")
    ]


def test_rules_empty_when_nothing_frequent(spark):
    rows = [(1, "a"), (2, "b")]
    assert (
        association_rules(
            _baskets(spark, rows), min_support=1.0, min_confidence=0.0
        ).collect()
        == []
    )
