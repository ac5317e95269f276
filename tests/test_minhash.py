"""MinHash/SimHash approximate dedup vs the exact Jaccard oracle."""

from __future__ import annotations

import pytest

from bigdataminingproject_spark.operators.dedup import ngram_jaccard_pairs
from bigdataminingproject_spark.operators.minhash import (
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_neardup_pairs,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # identical
        (2, base.replace("river", "ocean")),  # near-dup
        (3, "completely unrelated text about database query planning systems"),
        (4, "another separate document discussing distributed stream processing"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_identical_docs_full_signature_match(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0


def test_minhash_estimates_track_exact_jaccard(spark, docs):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    for pair, est in approx.items():
        assert pair in exact
        # 128 hashes ⇒ std error ~0.04 at J=0.5; allow generous 0.2
        assert abs(est - exact[pair]) < 0.2, (pair, est, exact[pair])


def test_minhash_signature_shape(spark, docs):
    sig = minhash_signatures(docs, num_hashes=16)
    assert len([c for c in sig.columns if c.startswith("mh_")]) == 16
    assert sig.count() == 5


def test_simhash_identical_zero_hamming(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0


def test_simhash_small_edit_small_hamming(spark):
    # SimHash is meaningful on longer documents: with ~200 tokens the
    # per-bit vote margins are large, so a small edit moves few bits
    base = " ".join(f"word{i}" for i in range(200))
    edited = base
    for i in range(0, 40, 4):  # change 10 of 200 tokens
        edited = edited.replace(f"word{i} ", f"changed{i} ")
    other = " ".join(f"different{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, base), (1, edited), (2, other)], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    near = bin(sigs[0] ^ sigs[1]).count("1")
    far = bin(sigs[0] ^ sigs[2]).count("1")
    assert near < 10
    assert far > 20  # unrelated docs ≈ 32 expected


def test_simhash_unrelated_docs_not_paired(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert (0, 3) not in pairs
    assert (3, 4) not in pairs


def test_simhash_signature_deterministic(spark, docs):
    a = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert a == b
    assert a[0] == a[1]


def test_minhash_verified_pairs_equal_exact_join(spark, docs):
    """The registry variant (banded candidates + exact verify) must equal
    the exact n-gram Jaccard join — recall miss bound (1-J^2)^64 ~ 1e-8."""
    from bigdataminingproject_spark.operators.minhash import (
        minhash_lsh_verified_pairs,
    )

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_verified_pairs(docs, threshold=0.5).collect()
    }
    assert verified == exact


def test_simhash_md5_mode_matches_xxhash_behavior(spark, docs):
    """md5 mode (60-bit, oracle-checkable) keeps SimHash semantics:
    identical docs at Hamming 0, unrelated docs unpaired."""
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, hash_mode="md5").collect()
    }
    assert pairs[(0, 1)] == 0
    assert not any(3 in p or 4 in p for p in pairs)
