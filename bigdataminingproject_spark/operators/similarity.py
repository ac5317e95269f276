"""Similarity search over embedding columns (north-star set).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
variant (random hyperplane signs) as the scale path. The dot products stay
JVM-side via higher-order functions (``F.zip_with`` + ``F.aggregate``) —
no Python per row. Embeddings are cast float→double once so scores are
bit-stable against a double-precision oracle.

Scale notes: brute force is O(Q·N) — fine when the query set is small and
broadcast; for N×N all-pairs use ``embedding_neardup_pairs`` only with a
bucketing prefix (LSH) or an IVF-style coarse quantizer. The LSH variant
shuffles on (band, bucket) instead of cross-joining.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The (small) query side is broadcast; the big vector side streams
    through one whole-stage-codegen'd map + TakeOrdered per query via a
    rank window. Self-matches are excluded.
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("v_vec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("q_vec"), F.col("v_vec")), 6),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vector pairs with cosine >= threshold (embedding near-dup).

    Exact all-pairs — quadratic, intended for modest partitions or as the
    within-bucket verifier after LSH bucketing (see lsh_bucketed_neardup).
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("vec_a")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vec_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
        .orderBy("id_a", "id_b")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no numpy RNG state —
    a fixed LCG so results are reproducible across engines/runs)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucketed_neardup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane LSH.

    Sign-bit signature of ``n_planes`` hyperplanes split into ``n_bands``
    bands; vectors sharing any band bucket become candidates, verified
    with exact cosine. Replaces the O(N²) cross join with a shuffle on
    (band, bucket) — the standard SimHash/LSH trade (recall < 1.0 for
    pairs near the threshold; raise n_planes/bands for recall).
    """
    planes = _hyperplanes(dim, n_planes)
    v = vectors.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vec")
    )
    sign_bits = [
        (dot(F.col("vec"), F.array(*[F.lit(c) for c in p])) > 0).cast("int")
        for p in planes
    ]
    per_band = n_planes // n_bands
    bands = [
        F.concat_ws(
            "",
            *[
                sign_bits[band * per_band + i].cast("string")
                for i in range(per_band)
            ],
        ).alias(f"band_{band}")
        for band in range(n_bands)
    ]
    sigs = v.select("vid", "vec", *bands)
    candidates = None
    for band in range(n_bands):
        a = sigs.select(
            F.col("vid").alias("id_a"),
            F.col("vec").alias("vec_a"),
            F.col(f"band_{band}").alias("bucket"),
        )
        b = sigs.select(
            F.col("vid").alias("id_b"),
            F.col("vec").alias("vec_b"),
            F.col(f"band_{band}").alias("bucket"),
        )
        cand = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
        candidates = cand if candidates is None else candidates.unionByName(cand)
    verified = (
        candidates.select("id_a", "id_b", "vec_a", "vec_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cosine_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    return verified.select("id_a", "id_b", "cosine_sim").orderBy("id_a", "id_b")


# --- query registry entries -------------------------------------------------

def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors for the first 5 vectors (exact baseline)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 5)
    return knn_bruteforce(vecs, queries, k=10)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-duplicate pairs at cosine >= 0.95."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(vecs, threshold=0.95)


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup (scale path; subset of the exact result)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return lsh_bucketed_neardup(vecs, threshold=0.95)
