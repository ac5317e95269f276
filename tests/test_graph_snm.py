"""Unit semantics for the round-7 additions: degree-oriented triangle
counting (operators/graph.py) and sorted-neighborhood near-dup pairs
(operators/dedup.py::snm_pairs) — hand-computed oracles on tiny graphs
and corpora; the registry queries carry the DuckDB gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.dedup import snm_pairs
from bigdataminingproject_spark.operators.graph import (
    cooccurrence_edges,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def test_k4_has_four_triangles_three_per_node(spark):
    k4 = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d")],
    )
    out = {r["token"]: r["triangles"] for r in triangle_counts(k4).collect()}
    # C(4,3)=4 triangles; each node sits in C(3,2)=3 of them
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_pendant_edge_adds_no_triangles(spark):
    g = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],  # triangle + tail
    )
    out = {r["token"]: r["triangles"] for r in triangle_counts(g).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}  # d participates in none


def test_star_graph_is_triangle_free(spark):
    star = _edges(spark, [("hub", "x"), ("hub", "y"), ("hub", "z")])
    assert triangle_counts(star).count() == 0


def test_cooccurrence_edges_canonical_and_thresholded(spark):
    docs = spark.createDataFrame(
        [
            (0, "linear algebra linear algebra"),  # (algebra,linear) x3
            (1, "algebra linear"),  # +1 → 4
            (2, "rare pairing"),  # count 1 → pruned at min_count=2
            (3, "echo echo echo"),  # self-loops dropped
        ],
        "doc_id long, text string",
    )
    rows = cooccurrence_edges(docs, min_count=2).collect()
    assert [(r["a"], r["b"]) for r in rows] == [("algebra", "linear")]


def test_snm_window_pairs_follow_sort_order(spark):
    # keys sort c1 < c2 < c3; window 1 pairs only adjacent positions
    docs = spark.createDataFrame(
        [(1, "aaa zzz"), (2, "bbb zzz"), (3, "ccc zzz")],
        "doc_id long, text string",
    )
    key = F.substring(F.concat_ws("", F.split(F.col("text"), " ")), 1, 3)
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in snm_pairs(docs, key, window=1).collect()
    )
    assert got == [(1, 2), (2, 3)]


def test_snm_sorted_token_key_catches_permuted_neardups(spark):
    # docs 1 and 4 are token-permutations: raw-prefix keys put them at
    # opposite ends of the sort, the sorted-token key makes them
    # adjacent — the multi-pass rationale of q_doc_snm_pairs
    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "dog elephant fox"),
            (3, "moon nebula orbit"),
            (4, "cherry banana apple"),
        ],
        "doc_id long, text string",
    )
    from bigdataminingproject_spark.functions.text import tokenize

    key_sorted = F.concat_ws(
        "", F.array_sort(F.array_distinct(tokenize(F.col("text"))))
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in snm_pairs(docs, key_sorted, window=1).collect()
    }
    assert (1, 4) in pairs or (4, 1) in pairs


def test_snm_handles_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "some words"), (3, "")],
        "doc_id long, text string",
    )
    key = F.concat_ws("", F.split(F.col("text"), " "))
    # empty keys sort first (proxy 0); no crash, pairs well-formed
    out = snm_pairs(docs, key, window=2).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in out)
