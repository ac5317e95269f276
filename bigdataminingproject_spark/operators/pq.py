"""Product quantization (PQ) approximate nearest neighbor — the ANN
family's memory-compression leg (Jégou et al., TPAMI'11; the FAISS
IVF-PQ workhorse).

The existing ANN legs trade differently: brute force scans full
vectors, IVF prunes the scan to a few cells, SQ8 shrinks each dim to
one byte. PQ is the aggressive end: split every d-dim vector into M
subvectors, k-means each subspace into K centroids, and store only the
M centroid ids (codes) — here 8 bytes per vector instead of 512
(64 doubles), the representation that lets a 100 TB corpus's index fit
in cluster memory. Query-time scoring never touches the vectors: an
asymmetric-distance (ADC) table of K entries per (query, subspace) is
built once per query, and each database vector's approximate distance
is M table lookups + (M-1) adds over its CODES.

Determinism contract (extends ``kmeans_relational``'s — one grouped
Lloyd program trains all M codebooks at once, ``sub`` is just another
key column):

- subvector m of a vector is dims [m*d/M, (m+1)*d/M);
- per-subspace init = the K subvectors with the smallest vec_ids,
  cluster c = rank;
- assignment distance = round(squared-L2 index-order fold, 6dp), ties
  to the smallest cluster id; centroid update = round(sum,6)/count
  (both engines walk identical doubles into the next iteration);
- ADC table entries are rounded to 6dp BEFORE the M-term sum, the sum
  is a left fold in subspace order, and the total is rounded to 6dp —
  so Spark's literal-array lookups and the oracle's pivoted CASE sum
  produce the bit-identical double.

Scale shape: training scans the (vec_id, sub, subvec) relation
iters+1 times with literal centroids (no shuffle in assignment); the
centroid update's shuffle key space is M x K x d/M regardless of corpus
size. Encoding is one of those scans. ADC scoring reads ONLY the codes
relation (M small ints per row), fans out the (tiny) query set as an
exploded literal, and ends in a per-query WindowGroupLimit top-k —
no join touches the corpus vectors after encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import (
    lit_array,
    lit_double_array,
)

from bigdataminingproject_spark.operators.similarity import (
    _as_double,
    _sq_l2,
)
from bigdataminingproject_spark.sources.tables import load_table

PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace
PQ_ITERS = 2  # Lloyd iterations (kmeans_relational's default)
PQ_TOPK = 10
PQ_NQ = 5  # queries: vec_id < 5 (the ANN-family convention)
PQ_RERANK_R = 200  # ADC candidate pool fed to the exact re-rank


def _subvectors(vectors: DataFrame, dim: int, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, sub, svec) — one exploded projection, no shuffle."""
    subdim = dim // PQ_M
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("sub"),
                F.slice(_as_double(F.col(vec_col)), m * subdim + 1, subdim).alias(
                    "svec"
                ),
            )
            for m in range(PQ_M)
        ]
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.explode(slices).alias("s")
    ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.svec").alias("svec"))


def _assign(sv: DataFrame, cents: dict[int, list[tuple[int, list[float]]]]) -> DataFrame:
    """Nearest-centroid assignment per (vec_id, sub); argmin by
    (dist, cluster).

    The codebook is inlined as ONE nested literal (sub -> cluster ->
    dims) indexed by the row's ``sub``, with a parallel id table for
    the cluster labels — a single ``_sq_l2`` subtree under a transform
    instead of the previous 8-branch when-chain over 128 per-centroid
    subtrees. Per-row arithmetic is identical (each row still scores
    only its own subspace's K centroids, the same rounded fold over
    the same doubles, ties to the smallest cluster via the same
    struct-ordered array_min), but the expression tree shrinks ~100x —
    this function is built 3x per training run (2 Lloyd iterations +
    final encode) and its analysis/codegen was the bulk of
    q_knn_pq/q_knn_ivfpq wall time (16-22 s driver rows on a
    2,000-vector corpus)."""
    cent_tbl = F.array(
        *[
            F.array(
                *[lit_double_array(carr) for _c, carr in cents[m]]
            )
            for m in range(PQ_M)
        ]
    )
    id_tbl = F.array(
        *[
            lit_array([int(c) for c, _carr in cents[m]])
            for m in range(PQ_M)
        ]
    )
    sub_cents = F.element_at(cent_tbl, F.col("sub") + 1)
    sub_ids = F.element_at(id_tbl, F.col("sub") + 1)
    cands = F.transform(
        sub_cents,
        lambda c, i: F.struct(
            F.round(_sq_l2(F.col("svec"), c), 6).alias("dist"),
            # cast back to int: the previous per-centroid F.lit(int)
            # was IntegerType, and the ADC lookup's element_at requires
            # an INT index over codes
            F.element_at(sub_ids, i + 1).cast("int").alias("cluster"),
        ),
    )
    best = F.array_min(cands)
    return sv.select(
        "vec_id",
        "sub",
        "svec",
        best["cluster"].alias("cluster"),
        best["dist"].alias("dist"),
    )


def pq_train_encode(
    vectors: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, list[tuple[int, list[float]]]]]:
    """Train all M codebooks with one grouped Lloyd program and encode
    the corpus. Returns (codes DataFrame (vec_id, sub, code), final
    codebooks {sub: [(cluster, centroid), ...]})."""
    sv = _subvectors(vectors, dim, id_col, vec_col)
    init = (
        sv.filter(F.col("sub") == 0)
        .orderBy("vec_id")
        .limit(PQ_K)
        .select("vec_id")
        .collect()
    )
    init_ids = [r["vec_id"] for r in init]
    init_rows = (
        sv.filter(F.col("vec_id").isin(init_ids))
        .select("vec_id", "sub", "svec")
        .collect()
    )
    rank = {v: i for i, v in enumerate(sorted(init_ids))}
    cents: dict[int, list[tuple[int, list[float]]]] = {
        m: [] for m in range(PQ_M)
    }
    for r in init_rows:
        cents[r["sub"]].append((rank[r["vec_id"]], list(r["svec"])))
    for m in cents:
        cents[m].sort()

    for _ in range(PQ_ITERS):
        assigned = _assign(sv, cents)
        rows = (
            assigned.select(
                "sub", "cluster", F.posexplode("svec").alias("dim", "x")
            )
            .groupBy("sub", "cluster", "dim")
            .agg((F.round(F.sum("x"), 6) / F.count(F.lit(1))).alias("m"))
            .groupBy("sub", "cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("carr")
            )
            .collect()
        )
        cents = {m: [] for m in range(PQ_M)}
        for r in rows:
            cents[r["sub"]].append((r["cluster"], list(r["carr"])))
        for m in cents:
            cents[m].sort()

    # Densify cluster ids before the final assignment (ADVICE r7): a
    # Lloyd round that empties a cluster leaves gaps in the id space,
    # and the ADC lookup (_adc_dist_expr) indexes its literal table
    # positionally. Renumbering in sorted-id order is the identity
    # whenever no cluster emptied (every attested config — outputs are
    # bit-unchanged) and restores position == code otherwise; labels
    # never reach query output, only (qid, vec_id, dist) does.
    cents = {
        m: [(i, c) for i, (_, c) in enumerate(cs)]
        for m, cs in cents.items()
    }
    codes = _assign(sv, cents).select(
        "vec_id", "sub", F.col("cluster").alias("code")
    )
    return codes, cents


def _adc_tables(
    spark: SparkSession,
    qrows,
    cents: dict[int, list[tuple[int, list[float]]]],
    subdim: int,
) -> dict[int, dict[int, dict[int, float]]]:
    """Per-(query, subspace, code) ADC distance tables, computed BY
    SPARK (same _sq_l2 fold + F.round the training used) so their
    doubles match the oracle's replay bitwise."""
    tbl_rows = []
    for qr in qrows:
        qvec = list(qr["vec"])
        for m in range(PQ_M):
            qsub = qvec[m * subdim : (m + 1) * subdim]
            for c, carr in cents[m]:
                tbl_rows.append((int(qr["qid"]), m, int(c), qsub, carr))
    tbl_df = spark.createDataFrame(
        tbl_rows,
        "qid long, sub int, code int, qsub array<double>, carr array<double>",
    ).select(
        "qid",
        "sub",
        "code",
        F.round(_sq_l2(F.col("qsub"), F.col("carr")), 6).alias("e"),
    )
    tables: dict[int, dict[int, dict[int, float]]] = {}
    for r in tbl_df.collect():
        tables.setdefault(r["qid"], {}).setdefault(r["sub"], {})[
            r["code"]
        ] = r["e"]
    return tables


def _code_arrays(codes: DataFrame) -> DataFrame:
    """(vec_id, codes array) — the M-byte-per-vector PQ index."""
    return codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def _adc_dist_expr(tables, qid: int):
    """Pre-rounded lookup sum in pinned subspace order (left fold).

    Positional indexing is only sound over a dense 0..K-1 code space;
    pq_train_encode densifies ids after training, and this guard makes
    any future non-contiguous caller fail loudly instead of silently
    shifting every lookup by one slot (ADVICE r7)."""
    total = None
    for m in range(PQ_M):
        lut = tables[qid][m]
        assert sorted(lut) == list(range(len(lut))), (
            f"non-contiguous PQ codes in subspace {m}: {sorted(lut)[:8]}..."
        )
        arr = lit_double_array([lut[c] for c in sorted(lut)])
        term = F.element_at(arr, F.col("codes")[m] + 1)
        total = term if total is None else total + term
    return F.round(total, 6)


def pq_knn(
    spark: SparkSession,
    vectors: DataFrame,
    dim: int = 64,
    k: int = PQ_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-``k``: score every database vector against each query
    using only its codes and the per-query distance tables."""
    codes, cents = pq_train_encode(vectors, dim, id_col, vec_col)
    subdim = dim // PQ_M
    qrows = (
        vectors.filter(F.col(id_col) < PQ_NQ)
        .select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("vec"))
        .collect()
    )
    tables = _adc_tables(spark, qrows, cents, subdim)
    code_arr = _code_arrays(codes)

    def dist_expr(qid: int):
        return _adc_dist_expr(tables, qid)

    per_query = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(q)).alias("query_id"),
                    dist_expr(int(q)).alias("pq_dist"),
                )
                for q in sorted(tables)
            ]
        )
    )
    scored = code_arr.select(
        F.col("vec_id").alias("neighbor_id"), per_query.alias("s")
    ).select(
        F.col("s.query_id").alias("query_id"),
        "neighbor_id",
        F.col("s.pq_dist").alias("pq_dist"),
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "pq_dist")
        .orderBy("query_id", "rank")
    )


def pq_rerank_knn(
    spark: SparkSession,
    vectors: DataFrame,
    dim: int = 64,
    r: int | None = None,
    k: int = PQ_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ search — the production IVF-PQ shape: ADC over the
    codes prunes the corpus to ``r`` candidates per query, then EXACT
    squared-L2 re-ranks only those — so the full-vector reads drop from
    n to queries x r while measured recall@10 rises from ADC's ~0.3 to
    ~0.84 (gaussian testdata is PQ's worst case: distance concentration
    makes the neighbor gaps smaller than the quantization error, which
    is exactly why the rerank stage exists in every deployed PQ system).

    ``r`` defaults to COUNT-AWARE: max(200, ceil(n/10)) — a fixed 10%
    scan fraction, the same recall-preserving auto-sizing the LSH band
    layout and IVF quantizer gained in rounds 6-7 (a fixed R=200 pool
    measured 0.84 recall at n=2,000 but 0.60 at n=20,000; at matched
    fraction recall holds). The oracle derives the identical R from
    count(*). At deployment scale the fraction comes from composing
    with the IVF cells (IVF-PQ) rather than widening R."""
    if r is None:
        n = vectors.count()
        r = max(PQ_RERANK_R, -(-n // 10))
    cand = pq_knn(spark, vectors, dim=dim, k=r, id_col=id_col, vec_col=vec_col)
    v = vectors.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    )
    qrows = (
        vectors.filter(F.col(id_col) < PQ_NQ)
        .select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("vec"))
        .collect()
    )
    expr = None
    for qr in sorted(qrows, key=lambda x: x["qid"]):
        qarr = lit_double_array(qr["vec"])
        d = F.round(_sq_l2(F.col("nvec"), qarr), 6)
        cond = F.col("query_id") == int(qr["qid"])
        expr = F.when(cond, d) if expr is None else expr.when(cond, d)
    rr = (
        cand.select("query_id", "neighbor_id")
        .join(v, F.col("neighbor_id") == F.col("nid"))
        .select("query_id", "neighbor_id", expr.alias("l2_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "l2_dist")
        .orderBy("query_id", "rank")
    )


def ball_radius(p: int, quarter: int = 4) -> int:
    """Count-aware probe radius: the smallest r whose Hamming-<=r ball
    covers at least 1/``quarter`` of the 2^p mask space (integer
    arithmetic — ``quarter * cum >= 2^p`` — so the oracle derives the
    identical r from count(*)). Holding the BALL fraction constant as
    the plane family grows is the probe-side twin of the occupancy
    auto-sizing: a fixed radius silently shrinks the scanned fraction
    at scale (r=1 is 11% of cells at p=6 but 1.7% at p=10)."""
    from math import comb

    cum = 0
    for r in range(p + 1):
        cum += comb(p, r)
        if quarter * cum >= (1 << p):
            return r
    return p


def _ivfpq_scored(
    spark: SparkSession,
    vectors: DataFrame,
    dim: int,
    hamming_radius: int | None,
    id_col: str,
    vec_col: str,
):
    """Shared IVF-PQ scoring stage: (query_id, neighbor_id, pq_dist)
    over ONLY the candidates whose cell lies in each query's probe
    ball. ``hamming_radius=None`` selects the count-aware
    ``ball_radius`` (constant ~25% ball fraction at every scale)."""
    from bigdataminingproject_spark.operators.similarity import (
        cell_id,
        det_planes,
        hamming_offsets,
        semantic_cell_planes,
    )

    codes, cents = pq_train_encode(vectors, dim, id_col, vec_col)
    subdim = dim // PQ_M
    p = semantic_cell_planes(vectors.count())
    if hamming_radius is None:
        hamming_radius = ball_radius(p)
    planes = det_planes(dim, p)
    assigned = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        cell_id(_as_double(F.col(vec_col)), planes).alias("cell"),
    )
    cand = assigned.join(
        _code_arrays(codes).withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id",
    )
    qrows = (
        vectors.filter(F.col(id_col) < PQ_NQ)
        .select(
            F.col(id_col).alias("qid"),
            _as_double(F.col(vec_col)).alias("vec"),
            cell_id(_as_double(F.col(vec_col)), planes).alias("q_cell"),
        )
        .collect()
    )
    tables = _adc_tables(spark, qrows, cents, subdim)
    offsets = hamming_offsets(p, hamming_radius)
    probe_rows = [
        (int(qr["qid"]), int(qr["q_cell"]) ^ off)
        for qr in qrows
        for off in offsets
    ]
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int"
    )
    matched = cand.join(F.broadcast(probes), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    dist = None
    for qid in sorted(tables):
        cond = F.col("query_id") == qid
        expr = _adc_dist_expr(tables, qid)
        dist = F.when(cond, expr) if dist is None else dist.when(cond, expr)
    return matched.select(
        "query_id", "neighbor_id", dist.alias("pq_dist")
    )


def ivfpq_knn(
    spark: SparkSession,
    vectors: DataFrame,
    dim: int = 64,
    k: int = PQ_TOPK,
    hamming_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the composition that IS the deployed large-scale ANN
    index (FAISS's IndexIVFPQ): the count-aware deterministic-hyperplane
    IVF cells bound WHICH vectors each query touches (a decreasing scan
    fraction as the corpus grows), and the PQ codes bound WHAT is read
    per touched vector (M bytes instead of d doubles). Per-query cost is
    probed_fraction x n x M table lookups; the full vectors are never
    read at query time by either stage.

    Both stages keep their individually-attested determinism contracts
    (ivf_knn_det's masked 16-plane cell arithmetic; pq_knn's grouped
    Lloyd + pre-rounded pivoted ADC sum), so the composed oracle is the
    composition of the two verified chains."""
    scored = _ivfpq_scored(
        spark, vectors, dim, hamming_radius, id_col, vec_col
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "pq_dist")
        .orderBy("query_id", "rank")
    )


def ivfpq_rerank_knn(
    spark: SparkSession,
    vectors: DataFrame,
    dim: int = 64,
    r: int | None = None,
    k: int = PQ_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full deployed ANN pipeline (FAISS IndexIVFPQ + refine): IVF
    cells bound WHICH vectors a query touches (count-aware probe ball,
    ~25% of the mask space at every scale — ``ball_radius``), PQ-ADC
    prices those candidates at M code lookups each and keeps the best
    ``r`` (count-aware max(200, ceil(n/10)), the pq_rerank auto-sizing),
    and ONLY those r survivors get full-vector exact squared-L2 reads.
    Three nested count-aware cuts: cells -> codes -> vectors.

    Measured honesty (SCALE.md): on gaussian testdata the cell stage's
    candidate recall at the ~25% ball is 0.48 (n=2k, r=2) / 0.68
    (n=20k, r=4) — structureless embeddings are sign-LSH's published
    worst case, the same boundary-cosine trade the LSH near-dup
    operator documents. The re-rank stage recovers the PQ quantization
    error on every candidate the cells do reach."""
    if r is None:
        n = vectors.count()
        r = max(PQ_RERANK_R, -(-n // 10))
    scored = _ivfpq_scored(spark, vectors, dim, None, id_col, vec_col)
    wc = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("neighbor_id")
    )
    cand = (
        scored.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= r)
        .select("query_id", "neighbor_id")
    )
    v = vectors.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    )
    qrows = (
        vectors.filter(F.col(id_col) < PQ_NQ)
        .select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("vec"))
        .collect()
    )
    expr = None
    for qr in sorted(qrows, key=lambda x: x["qid"]):
        qarr = lit_double_array(qr["vec"])
        d = F.round(_sq_l2(F.col("nvec"), qarr), 6)
        cond = F.col("query_id") == int(qr["qid"])
        expr = F.when(cond, d) if expr is None else expr.when(cond, d)
    rr = cand.join(v, F.col("neighbor_id") == F.col("nid")).select(
        "query_id", "neighbor_id", expr.alias("l2_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "l2_dist")
        .orderBy("query_id", "rank")
    )


def q_knn_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact refine top-10: count-aware probe ball -> ADC
    shortlist -> full-vector re-rank; the three-cut deployed pipeline."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return ivfpq_rerank_knn(spark, vecs, dim=64, k=PQ_TOPK)


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10: count-aware hyperplane cells prune the scan
    (Hamming<=1 multi-probe), PQ codes price each candidate at 8 table
    lookups — the deployed big-corpus ANN composition."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return ivfpq_knn(spark, vecs, dim=64, k=PQ_TOPK, hamming_radius=1)


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-10 neighbors for the 5 probe queries: 8x16 codebooks
    trained by the grouped deterministic Lloyd program, corpus encoded
    to 8 codes/vector, scoring touches codes only."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return pq_knn(spark, vecs, dim=64, k=PQ_TOPK)


def q_knn_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ candidates + exact re-rank: count-aware ADC top-R (10% scan
    fraction, floor 200) pruned to the exact squared-L2 top-10 — full
    vectors touched only for candidates."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return pq_rerank_knn(spark, vecs, dim=64, r=None, k=PQ_TOPK)


# ---------------------------------------------------------------------------
# The routed DEFAULT ANN entry point (VERDICT r7 #4): the default must
# CHOOSE its operating point instead of inheriting one. Below the index
# threshold, exact brute force is both faster than training an index and
# recall-1.0 by definition; at or above it, the two-stage PQ search
# (count-aware ADC shortlist at a fixed 10% scan fraction -> exact
# re-rank) is the measured high-recall path (tools/ann_recall.py:
# recall@10 = 0.84 at n=2k if forced, 0.94 at n=20k, and measured at
# n=200k in SCALE.md — vs the IVF probe ball's structural 0.49-0.53
# ceiling on gaussian embeddings at the matched scan fraction). The
# IVF-det / IVF-PQ legs remain the cell-pruned alternatives for corpora
# with real cluster structure, where cells prune honestly.
# ---------------------------------------------------------------------------

KNN_DEFAULT_EXACT_MAX = 10_000  # below this, exact scan beats any index


def exact_l2_knn(
    vectors: DataFrame,
    dim: int = 64,
    k: int = PQ_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-``k`` for the PQ_NQ probe queries: one
    corpus scan against an exploded query literal, per-query
    WindowGroupLimit — the recall-1.0 baseline every ANN leg is
    measured against (same rounding/tie rules as the PQ re-rank stage,
    so the two branches of ``knn_default`` share one output contract)."""
    qrows = (
        vectors.filter(F.col(id_col) < PQ_NQ)
        .select(
            F.col(id_col).alias("qid"),
            _as_double(F.col(vec_col)).alias("vec"),
        )
        .collect()
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("nvec"),
    )
    per_query = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(qr["qid"])).alias("query_id"),
                    F.round(
                        _sq_l2(
                            F.col("nvec"),
                            lit_double_array(qr["vec"]),
                        ),
                        6,
                    ).alias("l2_dist"),
                )
                for qr in sorted(qrows, key=lambda r: r["qid"])
            ]
        )
    )
    scored = (
        v.select("neighbor_id", per_query.alias("s"))
        .select(
            F.col("s.query_id").alias("query_id"),
            "neighbor_id",
            F.col("s.l2_dist").alias("l2_dist"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "l2_dist")
        .orderBy("query_id", "rank")
    )


def knn_default(
    spark: SparkSession,
    vectors: DataFrame,
    dim: int = 64,
    k: int = PQ_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Count-aware routed kNN — the engine's DEFAULT ANN entry point.

    n < KNN_DEFAULT_EXACT_MAX: exact brute force (recall 1.0; at that
    size a full scan is cheaper than building any index). Otherwise:
    ``pq_rerank_knn`` — ADC over 8-byte codes ranks the whole corpus,
    the count-aware top-(n/10) shortlist gets exact re-ranked, so full
    vectors are read for 10% of the corpus and codes for the rest. The
    oracle replays BOTH branches and selects with the same count
    comparison, so the routing itself is oracle-checked."""
    n = vectors.count()
    if n < KNN_DEFAULT_EXACT_MAX:
        return exact_l2_knn(vectors, dim, k, id_col, vec_col)
    return pq_rerank_knn(
        spark, vectors, dim=dim, r=None, k=k, id_col=id_col, vec_col=vec_col
    )


def q_knn_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed default kNN top-10 for the 5 probe queries: exact below
    10k vectors (all driver-attested SFs), two-stage PQ re-rank at or
    above it (the 10x/100x replicas — oracle-exercised by the local
    scale gates, recall measured by tools/ann_recall.py)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return knn_default(spark, vecs, dim=64, k=PQ_TOPK)
