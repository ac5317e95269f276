"""Distributed spectral analysis of the embedding corpus.

``power_iteration_top_pc`` computes the dominant principal direction of
the (uncentered) second-moment matrix WITHOUT ever materializing the
d x d Gram matrix: each iteration is two matvecs fused into one corpus
scan — per row the scalar projection ``dot = <x, v>`` (a sequential
fold over the array, JVM-side), then per dimension ``s_j = sum_rows
x_j * dot`` (one hash aggregation over posexploded components). That
is the scale path when d is large: ``embedding_covariance``
(operators/similarity.py) ships d^2 partial products per scan and its
driver-side eigensolve holds a d x d matrix, fine at d=64 but not at
d=4096; the Gram-free loop moves O(n*d) per iteration and only ever
collects the d-vector itself (the same bounded-state legitimacy class
as the k-means centroid update).

Cross-engine determinism (the DuckDB oracle replays every iteration):
the per-row dot product is a strict left-to-right fold on BOTH engines
(Spark ``aggregate``; DuckDB ``list_reduce`` — DuckDB starts the fold
at the first element, Spark at 0.0, and ``0.0 + x == x`` exactly, so
the grouping is identical); the only operation whose float result
depends on execution order is the per-dimension row sum, which is
half-up-quantized at 1e-8 (functions/numeric.py rationale) so shuffle-
order ulp noise cannot move it; every downstream value (norm via
IEEE-exact sqrt, normalized components re-quantized at 1e-12, the
Rayleigh eigenvalue) is then a deterministic function of identical
doubles. Quantizing v each round also re-synchronizes the engines, so
error cannot compound across iterations.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import lit_array

from bigdataminingproject_spark.sources.tables import load_table

PI_DIM = 64
PI_ITERS = 6


def _stable(x: float, decimals: int) -> float:
    """Python twin of floor(x*10^d + 0.5)/10^d — the engine-stable
    half-up rounding both SQL sides use (functions/numeric.py)."""
    scale = float(10**decimals)
    return math.floor(x * scale + 0.5) / scale


def power_iteration_top_pc(
    vecs: DataFrame,
    dim: int = PI_DIM,
    iters: int = PI_ITERS,
    emb_col: str = "embedding",
) -> DataFrame:
    """Top principal direction of the uncentered second-moment matrix
    via Gram-free distributed power iteration. Returns one row per
    dimension: (j, component, eigval) with a deterministic sign (first
    nonzero component positive)."""
    spark = vecs.sparkSession
    base = vecs.select(
        F.transform(F.col(emb_col), lambda e: e.cast("double")).alias("x")
    ).persist()
    v = [_stable(1.0 / math.sqrt(dim), 12)] * dim
    eig = 0.0
    for _ in range(iters):
        vlit = lit_array(list(v))
        dot = F.aggregate(
            F.zip_with(F.col("x"), vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        rows = (
            base.select(dot.alias("dot"), F.posexplode("x").alias("j", "xj"))
            .groupBy("j")
            .agg(F.sum(F.col("xj") * F.col("dot")).alias("raw"))
            .select(
                "j",
                (
                    F.floor(F.col("raw") * F.lit(1e8) + F.lit(0.5))
                    / F.lit(1e8)
                ).alias("s"),
            )
            .collect()  # d rows — the bounded state of the iteration
        )
        s = [0.0] * dim
        for r in rows:
            s[r["j"]] = r["s"]
        sumsq = 0.0
        for c in s:
            sumsq += c * c
        norm = math.sqrt(sumsq)
        if norm == 0.0:
            break
        eig = _stable(norm, 6)
        v = [math.floor((c / norm) * 1e12 + 0.5) / 1e12 for c in s]
    base.unpersist()
    flip = -1.0 if next((c for c in v if c != 0.0), 1.0) < 0 else 1.0
    out = [(j, (v[j] * flip) + 0.0, eig) for j in range(dim)]
    return spark.createDataFrame(
        out, "j int, component double, eigval double"
    )


def q_embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus (6
    Gram-free power iterations) with its Rayleigh eigenvalue — the
    spectral summary a curation pipeline uses to detect a collapsed or
    anisotropic embedding space before trusting cosine geometry."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return power_iteration_top_pc(vecs).orderBy("j")


def power_iteration_oracle_sql(
    dim: int = PI_DIM, iters: int = PI_ITERS
) -> str:
    """DuckDB twin: every iteration unrolled as CTE stages replaying
    the identical quantized arithmetic (module docstring). Stages are
    MATERIALIZED: DuckDB inlines CTEs by default, and the v->d->s->n->v
    chain references each stage more than once (n and v both read s;
    every row of d reads the previous v through a scalar subquery), so
    un-materialized the plan re-evaluates earlier iterations
    combinatorially — the SQL edition of the lazy-lineage blowup that
    localCheckpoint cures on the Spark side."""
    v0 = repr(_stable(1.0 / math.sqrt(dim), 12))
    blocks = [
        f"v0 AS MATERIALIZED (SELECT unnest(range(0, {dim})) AS j, {v0} AS v)"
    ]
    prev = "v0"
    for t in range(1, iters + 1):
        blocks.append(f"""
        d{t} AS MATERIALIZED (
            SELECT list_reduce(
                       list_transform(range(1, {dim + 1}),
                                      i -> xe[i] * vl[i]),
                       (a, b) -> a + b) AS dot,
                   xe
            FROM (SELECT CAST(embedding AS DOUBLE[]) AS xe,
                         (SELECT list(v ORDER BY j) FROM {prev}) AS vl
                  FROM embeddings)
        ),
        s{t} AS MATERIALIZED (
            SELECT j, floor(sum(xj * dot) * 1e8 + 0.5) / 1e8 AS s
            FROM (SELECT dot, unnest(xe) AS xj,
                         unnest(range(0, {dim})) AS j
                  FROM d{t})
            GROUP BY j
        ),
        n{t} AS MATERIALIZED (
            SELECT sqrt(list_reduce(
                       list_transform(
                           (SELECT list(s ORDER BY j) FROM s{t}),
                           x -> x * x),
                       (a, b) -> a + b)) AS norm
        ),
        v{t} AS MATERIALIZED (
            SELECT j,
                   floor((s / (SELECT norm FROM n{t})) * 1e12 + 0.5)
                       / 1e12 AS v
            FROM s{t}
        )""")
        prev = f"v{t}"
    return (
        "WITH "
        + ",".join(blocks)
        + f""",
        sgn AS (
            SELECT CASE WHEN coalesce(
                       (SELECT v FROM v{iters} WHERE v <> 0
                        ORDER BY j LIMIT 1), 1.0) < 0
                   THEN -1.0 ELSE 1.0 END AS f
        )
        SELECT CAST(j AS INT) AS j,
               (v * (SELECT f FROM sgn)) + 0.0 AS component,
               floor((SELECT norm FROM n{iters}) * 1e6 + 0.5) / 1e6
                   AS eigval
        FROM v{iters}
        ORDER BY j
    """
    )
