"""KMV bottom-k distinct sketch: estimator exactness on the small-set
branch, fold closure under union (the LSM merge_transform contract),
third-implementation estimator parity in pure Python, and accuracy vs
the exact contamination matrix on real testdata.

No reference counterpart (north-star sketch family beyond the
reference's bloom/CMS/DGIM surface, operators/sketches.py parity notes).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.kmv import (
    KMV_K,
    fold_kmv_partials,
    kmv_hash,
    kmv_pair_overlap,
    kmv_sketch,
)


def _py_hash48(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:12], 16)


def _py_estimate(hashes: list[int], k: int) -> float:
    """Third implementation of the Beyer et al. estimator, pinned op
    order — must agree bitwise with both engines before rounding."""
    bot = sorted(set(hashes))[:k]
    if len(bot) < k:
        return float(len(bot))
    return float(k - 1) * (281474976710656.0 / float(bot[-1]))


def test_kmv_hash_matches_python_md5(spark):
    df = spark.createDataFrame([(f"tok{i}",) for i in range(64)], "v string")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", kmv_hash(F.col("v")).alias("h")).collect()
    }
    for v, h in got.items():
        assert h == _py_hash48(v)


def test_small_set_branch_is_exact(spark):
    # 40 distinct values < k=64: sketch IS the set, estimate == exact
    rows = [("s", f"v{i}") for i in range(40)] * 3  # duplicates collapse
    df = spark.createDataFrame(rows, "source string, v string")
    sk = kmv_sketch(df, F.col("v"), k=64)
    assert sk.count() == 40
    hs = [r["h"] for r in sk.collect()]
    assert _py_estimate(hs, 64) == 40.0


def test_estimator_accuracy_and_python_parity(spark):
    # 5000 distinct values, k=256: estimate within ~3/sqrt(k) (18.75%);
    # and the Spark-side kth hash drives the same double as Python.
    n, k = 5000, 256
    df = spark.createDataFrame(
        [("s", f"value-{i}") for i in range(n)], "source string, v string"
    )
    sk = kmv_sketch(df, F.col("v"), k=k)
    hs = sorted(r["h"] for r in sk.collect())
    assert len(hs) == k
    est = _py_estimate(hs, k)
    assert abs(est - n) / n < 3.0 / math.sqrt(k)
    # parity with an all-Python rebuild of the sketch
    py = sorted(set(_py_hash48(f"value-{i}") for i in range(n)))[:k]
    assert hs == py


def test_fold_closure_under_union(spark):
    # bottom-k of the union == fold of per-slice bottom-ks, any split
    vals = [f"w{i}" for i in range(1200)]
    full = spark.createDataFrame(
        [("s", v) for v in vals], "source string, v string"
    )
    whole = kmv_sketch(full, F.col("v"), k=100)
    parts = [
        kmv_sketch(
            spark.createDataFrame(
                [("s", v) for v in vals[i::3]], "source string, v string"
            ),
            F.col("v"),
            k=100,
        )
        for i in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    folded = fold_kmv_partials(stacked, k=100)
    assert sorted(r["h"] for r in folded.collect()) == sorted(
        r["h"] for r in whole.collect()
    )


def test_pair_overlap_exact_small_sets(spark):
    # Two groups with known overlap, both under k: every estimate is
    # exact — jaccard, union, per-side distinct counts.
    a = [f"c{i}" for i in range(30)]  # 30 values
    b = [f"c{i}" for i in range(20, 50)]  # 30 values, overlap=10
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "source string, v string")
    sk = kmv_sketch(df, F.col("v"), k=64)
    out = kmv_pair_overlap(sk, k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert r["k_in_union"] == 50
    assert r["shared_in_k"] == 10
    assert r["jaccard_est"] == pytest.approx(10 / 50, abs=1e-9)
    assert r["union_est"] == 50.0
    assert r["distinct_a_est"] == 30.0
    assert r["distinct_b_est"] == 30.0


def test_sketched_jaccard_tracks_exact_on_testdata(spark):
    # vs the exact contamination matrix at sf0.01: KMV jaccard_est must
    # land within the standard error envelope of the exact jaccard for
    # every pair (k=256 → se ≈ sqrt(j(1-j)/k); allow 4 se + small-count
    # floor). This is the accuracy claim the sketch ships with.
    from bigdataminingproject_spark.operators.kmv import (
        q_source_kmv_overlap,
    )
    from bigdataminingproject_spark.operators.quality import (
        source_contamination_matrix,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.01"
    est = {
        (r["source_a"], r["source_b"]): r["jaccard_est"]
        for r in q_source_kmv_overlap(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["source_a"], r["source_b"]): r["jaccard_bp"] / 10000.0
        for r in source_contamination_matrix(docs).collect()
    }
    assert set(est) == set(exact)
    for pair, j_exact in exact.items():
        se = math.sqrt(max(j_exact * (1 - j_exact), 0.01) / KMV_K)
        assert abs(est[pair] - j_exact) <= 4 * se, (
            pair,
            est[pair],
            j_exact,
        )


def test_stream_twin_lands_on_batch(spark):
    """4 replayed micro-batch folds over the LSM store must land
    exactly on the batch sketch output (bottom-k closure under
    union, recursively through compaction)."""
    from bigdataminingproject_spark.operators.kmv import (
        q_source_kmv_overlap,
    )
    from bigdataminingproject_spark.streaming.pipeline import (
        q_stream_kmv_maintenance,
    )

    sf_dir = "/root/testdata/sf0.001"
    batch = sorted(
        tuple(r) for r in q_source_kmv_overlap(spark, sf_dir).collect()
    )
    live = sorted(
        tuple(r) for r in q_stream_kmv_maintenance(spark, sf_dir).collect()
    )
    assert live == batch
