"""Greedy k-center coreset selection (farthest-point traversal).

The diverse-exemplar primitive of data pruning / active learning:
pick k points such that every corpus vector is close to some pick —
Gonzalez's 2-approximation to the k-center objective, the shape
SemDeDup/def2prune-style curation papers use to keep coverage while
cutting volume.

Scale shape: k-1 scans, each computing every vector's min squared-L2
distance to the chosen set (a fold over at most k broadcast literal
centroids — no join, no shuffle beyond the TakeOrdered argmax of one
row); driver state is k x d floats. At 100 TB each round is one
full-scan map + a 1-row reduction, which is the honest cost of the
GLOBAL farthest point — there is no partition-local shortcut that
preserves the greedy sequence.

Determinism (what lets DuckDB replay it): round-0 pick is the
smallest vec_id; every distance is rounded at 6 dp BEFORE the min/
argmax; argmax ties break to the smallest vec_id. The distance fold
is the same index-order zip the kmeans family pins against
list_dot_product.

No reference counterpart (north-star curation family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import lit_double_array

from bigdataminingproject_spark.operators.similarity import _sq_l2
from bigdataminingproject_spark.sources.tables import load_table

CORESET_K = 8


def kcenter_coreset(
    vectors: DataFrame,
    k: int = CORESET_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(pick_round, vec_id, dist) for the greedy k-center sequence;
    ``dist`` is the pick's rounded squared-L2 distance to the nearest
    earlier pick (0.0 for round 0) — the non-increasing covering-radius
    sequence."""
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).filter(F.col("vec").isNotNull())
    out_schema = "pick_round int, vec_id long, dist double"
    seed = v.orderBy("vec_id").limit(1).collect()
    if not seed:
        return spark.createDataFrame([], out_schema)
    chosen = [(0, seed[0]["vec_id"], 0.0, list(seed[0]["vec"]))]
    while len(chosen) < k:
        dmin = None
        for _, _, _, carr in chosen:
            cent = lit_double_array(carr)
            d = F.round(_sq_l2(F.col("vec"), cent), 6)
            dmin = d if dmin is None else F.least(dmin, d)
        # dist > 0 BEFORE the argmax (mirrored by the oracle's WHERE):
        # when every remaining point coincides with a pick the corpus
        # is exhausted and both engines stop at the same short sequence
        far = (
            v.select("vec_id", "vec", dmin.alias("dist"))
            .filter(F.col("dist") > 0.0)
            .orderBy(F.desc("dist"), "vec_id")
            .limit(1)
            .collect()
        )
        if not far:
            break  # corpus exhausted (fewer distinct points than k)
        r = far[0]
        chosen.append((len(chosen), r["vec_id"], float(r["dist"]), list(r["vec"])))
    return spark.createDataFrame(
        [(rnd, vid, d) for rnd, vid, d, _ in chosen], out_schema
    ).orderBy("pick_round")


def q_embedding_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 8-center coreset over the embeddings table (diverse
    exemplar sequence + covering radii)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(vecs, k=CORESET_K)
