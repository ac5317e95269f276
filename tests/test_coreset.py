"""Greedy k-center coreset (operators/coreset.py): numpy parity of the
full greedy sequence, covering-radius monotonicity, coverage quality vs
random picks, and small-corpus exhaustion.

No reference counterpart (north-star curation family).
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdataminingproject_spark.operators.coreset import (
    CORESET_K,
    kcenter_coreset,
    q_embedding_coreset,
)
from bigdataminingproject_spark.sources.tables import load_table


def _py_greedy(vecs: dict[int, np.ndarray], k: int):
    """Third implementation: same seed/rounding/tiebreak rules."""
    ids = sorted(vecs)
    chosen = [(0, ids[0], 0.0)]
    sel = [ids[0]]
    while len(chosen) < k:
        best = None
        for i in ids:
            d = min(
                round(float(np.sum((vecs[i] - vecs[c]) ** 2)), 6)
                for c in sel
            )
            # ids ascend, so keeping the FIRST max is the
            # smallest-id tiebreak
            if best is None or d > best[1]:
                best = (i, d)
        if best[1] == 0.0:
            break
        chosen.append((len(chosen), best[0], best[1]))
        sel.append(best[0])
    return chosen


def test_matches_numpy_greedy_sequence(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in emb.collect()
    }
    want = _py_greedy(vecs, CORESET_K)
    got = [
        (r["pick_round"], r["vec_id"], r["dist"])
        for r in q_embedding_coreset(spark, sf_dir).collect()
    ]
    assert got == want
    assert len(got) == CORESET_K


def test_covering_radius_is_non_increasing(spark, sf_dir):
    rows = q_embedding_coreset(spark, sf_dir).collect()
    radii = [r["dist"] for r in rows[1:]]  # round 0 is the 0.0 seed
    assert radii == sorted(radii, reverse=True)
    assert radii[-1] > 0.0


def test_beats_first_k_on_coverage(spark, sf_dir):
    """The greedy picks must cover the corpus strictly better than the
    first-k-ids baseline (the whole point of farthest-point)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in emb.collect()
    }

    def radius(sel):
        return max(
            min(float(np.sum((v - vecs[c]) ** 2)) for c in sel)
            for v in vecs.values()
        )

    greedy = [
        r["vec_id"] for r in q_embedding_coreset(spark, sf_dir).collect()
    ]
    baseline = sorted(vecs)[: len(greedy)]
    assert radius(greedy) < radius(baseline)


def test_null_embeddings_are_skipped(spark):
    rows = [
        (1, [0.0, 0.0]),
        (2, None),
        (3, [3.0, 4.0]),
        (4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    picks = kcenter_coreset(df, k=3).collect()
    assert [r["vec_id"] for r in picks] == [1, 3, 4]


def test_exhausts_small_corpus(spark):
    rows = [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kcenter_coreset(df, k=10)
    picks = got.collect()
    assert len(picks) == 3  # stops when every point is a pick
    assert picks[0]["vec_id"] == 1 and picks[0]["dist"] == 0.0
