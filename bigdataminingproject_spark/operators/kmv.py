"""KMV (K-Minimum-Values, "bottom-k") distinct sketch with set-operation
estimators — the bounded-state twin of the exact source-contamination
matrix.

The exact cross-source overlap operator
(``quality.source_contamination_matrix``, reference parity family
streaming/detectors/duplicate_detector.py's shingle sets) keeps one row
per distinct (source, shingle) — at 100 TB that relation is itself
corpus-sized. The KMV sketch (Bar-Yossef et al., RANDOM'02; Beyer et
al., SIGMOD'07 for the set-operation estimators) keeps only the k
smallest hash values per source: O(sources x k) state, mergeable by
construction, yet it answers the same questions — distinct cardinality,
union size, pairwise Jaccard — with relative error ~1/sqrt(k).

Why THIS sketch instead of HLL for the overlap matrix: HLL registers
union cheaply but cannot intersect; KMV supports intersection/Jaccard
natively because the bottom-k of A ∪ B is a uniform sample of A ∪ B in
hash space, so the fraction of it landing in A ∩ B estimates the
Jaccard directly.

Determinism contract (what makes a DuckDB oracle possible):

- the hash is the first 12 hex chars of md5(value) read as a 48-bit
  integer — exact in BIGINT and in double (< 2^53), identical in both
  engines;
- a sketch is the k smallest DISTINCT hashes (dedup before ranking, so
  a value appearing in a million docs weighs once);
- the estimator is the Beyer et al. unbiased form
  ``(k-1) / U_(k)`` with ``U_(k) = h_k / 2^48``, computed as
  ``(k-1) * (2^48 / h_k)`` — two IEEE double ops in a pinned order, so
  both engines produce the bit-identical double;
- when a sketch holds fewer than k hashes it IS the whole set and every
  estimate collapses to the exact value (the small-set branch both
  engines express as the same CASE).

Scale shape: one shuffle to dedup (source, hash), one per-source
WindowGroupLimit (partial top-k before the exchange), then every
downstream relation is pairs x k — the pair matrix never touches the
corpus again. Exactly the state the streaming twin folds in the LSM
store: bottom-k is closed under disjoint union
(bottom-k(A ∪ B) ⊆ bottom-k(A) ∪ bottom-k(B)), so compaction re-ranks
and truncates instead of stacking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.text import shingles, tokenize
from bigdataminingproject_spark.sources.tables import load_table

KMV_K = 256
_HASH_SPACE = 281474976710656.0  # 2^48


def kmv_hash(col) -> F.Column:
    """48-bit md5-derived hash as BIGINT — exact in double, identical
    in Spark and DuckDB (``CAST('0x' || substr(md5(v),1,12) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def kmv_sketch(
    df: DataFrame,
    value: F.Column,
    group_col: str = "source",
    k: int = KMV_K,
) -> DataFrame:
    """Bottom-``k`` sketch per group: the k smallest distinct 48-bit
    hashes of ``value``. Returns (source, h) rows — also the mergeable
    PARTIAL for the streaming twin (fold = same op over stacked rows)."""
    hashed = df.select(
        F.col(group_col).alias("source"), kmv_hash(value).alias("h")
    ).distinct()
    return fold_kmv_partials(hashed, k)


def fold_kmv_partials(parts: DataFrame, k: int = KMV_K) -> DataFrame:
    """N-ary merge of KMV partials: per-group bottom-``k`` over the
    stacked distinct hashes. Exact by bottom-k closure under union and
    associative/commutative — the LSM store's ``merge_transform``:
    every compacted level stays ≤ groups x k rows."""
    w = Window.partitionBy("source").orderBy(F.asc("h"))
    return (
        parts.distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def _estimate(n_col, kth_col, k: int):
    """Beyer et al. distinct estimate with the exact small-set branch.

    Pinned op order: ``(k-1) * (2^48 / h_k)`` — both engines execute
    the same two IEEE divisions/multiplies, so the doubles agree bitwise
    before the presentation-time round.
    """
    return F.when(n_col < F.lit(k), n_col.cast("double")).otherwise(
        F.lit(float(k - 1)) * (F.lit(_HASH_SPACE) / kth_col.cast("double"))
    )


def kmv_pair_overlap(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise set-operation estimates from per-group sketches.

    For every unordered group pair (a, b): take the bottom-k of the
    UNION of the two sketches (a valid KMV sketch of A ∪ B), count how
    many of those hashes occur in both sides (→ Jaccard numerator), and
    apply the distinct estimator to the union's kth hash. All relations
    after the sketch are pairs x k — the broadcast side is the (tiny)
    pair list, never the corpus.
    """
    srcs = sketch.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    ra = F.broadcast(pairs).join(
        sketch, pairs["source_a"] == sketch["source"]
    ).select("source_a", "source_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    rb = F.broadcast(pairs).join(
        sketch, pairs["source_b"] == sketch["source"]
    ).select("source_a", "source_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ra.unionByName(rb)
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("source_a", "source_b").orderBy(F.asc("h"))
    union_k = merged.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    per_pair = union_k.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("k_in_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("shared_in_k"),
        F.max("h").alias("_kth"),
    )
    # per-source distinct estimates ride along from each side's own sketch
    own = sketch.groupBy("source").agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_kth_own")
    )
    own_est = own.select(
        "source",
        F.round(_estimate(F.col("_n"), F.col("_kth_own"), k), 4).alias("_est"),
    )
    ea = own_est.select(
        F.col("source").alias("source_a"), F.col("_est").alias("distinct_a_est")
    )
    eb = own_est.select(
        F.col("source").alias("source_b"), F.col("_est").alias("distinct_b_est")
    )
    jacc = (
        F.col("shared_in_k").cast("double")
        / F.col("k_in_union").cast("double")
    )
    return (
        per_pair.join(F.broadcast(ea), "source_a")
        .join(F.broadcast(eb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("k_in_union").cast("bigint").alias("k_in_union"),
            F.col("shared_in_k").cast("bigint").alias("shared_in_k"),
            F.round(jacc, 6).alias("jaccard_est"),
            F.round(
                _estimate(F.col("k_in_union"), F.col("_kth"), k), 4
            ).alias("union_est"),
            "distinct_a_est",
            "distinct_b_est",
        )
        .orderBy("source_a", "source_b")
    )


def q_source_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched cross-source shingle-overlap matrix: the
    O(sources x k)-state estimate of ``q_source_contamination``'s exact
    answer — what a 100 TB pipeline actually runs, because the exact
    matrix's distinct (source, shingle) relation is corpus-sized while
    this one forgets everything but 256 hashes per source after one
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    ssh = docs.select(
        "source",
        F.explode(shingles(tokenize(F.col("text")), 3)).alias("sh"),
    )
    sk = kmv_sketch(ssh, F.col("sh"), group_col="source", k=KMV_K)
    return kmv_pair_overlap(sk, k=KMV_K)
