"""Product-quantization ANN: code compactness, ADC table semantics,
exactness of the re-rank leg against a numpy third implementation, and
the measured recall floor that justifies the two-stage shape.

No reference counterpart (north-star ANN family; the reference has no
vector search at all)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.pq import (
    PQ_K,
    PQ_M,
    pq_train_encode,
    q_knn_pq,
    q_knn_pq_rerank,
)
from bigdataminingproject_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _mat(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def test_codes_are_m_small_ints(spark):
    vecs = load_table(spark, SF, "embeddings")
    codes, cents = pq_train_encode(vecs)
    n = vecs.count()
    assert codes.count() == n * PQ_M
    stats = codes.agg(
        F.min("code").alias("lo"), F.max("code").alias("hi")
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] < PQ_K
    # every codebook is at most K centroids of the right width
    for m in range(PQ_M):
        assert len(cents[m]) <= PQ_K
        assert all(len(c) == 64 // PQ_M for _, c in cents[m])


def test_adc_ranks_are_monotone(spark):
    out = q_knn_pq(spark, SF).collect()
    per_q: dict[int, list[tuple[int, float]]] = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["pq_dist"]))
    assert set(per_q) == {0, 1, 2, 3, 4}
    for q, pairs in per_q.items():
        pairs.sort()
        dists = [d for _, d in pairs]
        assert dists == sorted(dists)
        assert all(d >= 0 for d in dists)


def test_rerank_distances_are_exact(spark):
    # the re-rank leg's l2_dist must equal numpy's exact squared L2
    # (rounded to 6dp) for every reported neighbor
    ids, mat = _mat(spark, SF)
    idx = {v: i for i, v in enumerate(ids)}
    for r in q_knn_pq_rerank(spark, SF).collect():
        d = mat[idx[r["query_id"]]] - mat[idx[r["neighbor_id"]]]
        # index-order fold to mirror the engines' summation order
        acc = 0.0
        for x in d:
            acc += x * x
        assert r["l2_dist"] == pytest.approx(acc, abs=2e-6)


def test_rerank_recall_floor(spark):
    # measured 0.84 at sf0.1 with M=8, R=200 (gaussian embeddings are
    # PQ's worst case); pin a 0.6 floor at sf0.01 so a regression in
    # training/encoding/table arithmetic is loud
    ids, mat = _mat(spark, SF)
    idx = {v: i for i, v in enumerate(ids)}
    got: dict[int, set[int]] = {}
    for r in q_knn_pq_rerank(spark, SF).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for q, neigh in got.items():
        d2 = ((mat - mat[idx[q]]) ** 2).sum(axis=1)
        d2[idx[q]] = np.inf
        true10 = set(ids[np.argsort(d2)[:10]])
        recalls.append(len(true10 & neigh) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_rerank_beats_raw_adc(spark):
    # the whole point of the second stage: re-ranked recall must be at
    # least raw ADC's on the same corpus
    ids, mat = _mat(spark, SF)
    idx = {v: i for i, v in enumerate(ids)}

    def recall(rows):
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recs = []
        for q, neigh in got.items():
            d2 = ((mat - mat[idx[q]]) ** 2).sum(axis=1)
            d2[idx[q]] = np.inf
            true10 = set(ids[np.argsort(d2)[:10]])
            recs.append(len(true10 & neigh) / 10)
        return sum(recs) / len(recs)

    adc = recall(q_knn_pq(spark, SF).collect())
    rr = recall(q_knn_pq_rerank(spark, SF).collect())
    assert rr >= adc
