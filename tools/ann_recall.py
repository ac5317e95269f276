"""ANN recall@k measurement (VERDICT r5 #4).

Quantifies what the auto-sizing work claims qualitatively: that the
LSH band layout (``_auto_band_bits``) and the IVF multi-probe keep
RECALL as the corpus grows, not just occupancy. Ground truth is
computed HERE in numpy (blockwise exact cosines over the collected
embedding matrix — a third, Spark-and-DuckDB-independent
implementation), so the measurement can't inherit a bug from the
operators it scores.

Usage: python tools/ann_recall.py [sf_dir ...]
Defaults to sf0.1 and the 10x probe dir when present. Prints one JSON
line per dir:
  {"dir": ..., "n": N, "lsh_recall": r, "lsh_true_pairs": T,
   "ivf_recall_at_10": r, "queries": Q}

Note the collect here is a measurement-tool convenience (64-dim
vectors: ~10 MB at 10x) — the scored operators themselves never
collect; see similarity.py for their plan shapes.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

THRESHOLD = 0.45
K = 10
N_QUERIES = 64


def _embeddings_matrix(spark, sf_dir):
    from bigdataminingproject_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _true_pairs(ids, mat, block=2048):
    """Exact cosine pairs >= THRESHOLD (round-6, id_a < id_b) with
    their cosines, for per-regime recall buckets."""
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    out = {}
    n = len(ids)
    for s in range(0, n, block):
        e = min(s + block, n)
        sims = unit[s:e] @ unit.T  # (block, n)
        sims = np.round(sims, 6)
        ai, bi = np.nonzero(sims >= THRESHOLD)
        for a, b in zip(ai, bi):
            ia, ib = ids[s + a], ids[b]
            if ia < ib:
                out[(int(ia), int(ib))] = float(sims[a, b])
    return out


def _true_knn(ids, mat, query_idx, k=K):
    """Exact top-k neighbor ids per query (round-6 cosine, tie -> lower
    id), matching the operators' ordering convention."""
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    truth = {}
    for qi in query_idx:
        sims = np.round(unit[qi] @ unit.T, 6)
        sims[qi] = -np.inf  # exclude self
        order = np.lexsort((ids, -sims))  # by -sim, then id asc
        truth[int(ids[qi])] = [int(ids[j]) for j in order[:k]]
    return truth


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.similarity import (
        ivf_knn_det,
        lsh_bucketed_neardup_det,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    ids, mat = _embeddings_matrix(spark, sf_dir)
    n = len(ids)
    step = max(1, n // N_QUERIES)
    query_idx = list(range(0, n, step))[:N_QUERIES]
    query_ids = {int(ids[i]) for i in query_idx}

    vecs = load_table(spark, sf_dir, "embeddings")

    # --- LSH pair recall vs exact numpy ground truth, by cosine regime
    truth_pairs = _true_pairs(ids, mat)
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucketed_neardup_det(
            vecs, threshold=THRESHOLD
        ).collect()
    }
    assert got_pairs <= set(truth_pairs), "LSH emitted a non-true pair"
    lsh_recall = len(got_pairs & set(truth_pairs)) / max(
        1, len(truth_pairs)
    )
    regimes = {}
    for lo, hi in ((0.45, 0.6), (0.6, 0.75), (0.75, 0.9), (0.9, 1.01)):
        t = [p for p, c in truth_pairs.items() if lo <= c < hi]
        g = sum(1 for p in t if p in got_pairs)
        regimes[f"[{lo},{hi})"] = {
            "true": len(t),
            "found": g,
            "recall": round(g / len(t), 4) if t else None,
        }

    # --- LSH recall on PLANTED near-dups (the operating regime the
    # operator exists for; the synthetic fixture's true pairs all sit
    # at the 0.45-0.6 boundary where sign-LSH is weak by construction).
    # Each planted vector is a seeded noisy copy of a corpus vector at
    # cosine ~0.95; recall over planted pairs measures what the
    # auto-sized layout delivers on real near-duplicates.
    rng = np.random.RandomState(7)
    m = max(32, min(200, n // 10))
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    base_idx = rng.choice(n, m, replace=False)
    noise = rng.standard_normal((m, mat.shape[1]))
    noise /= np.linalg.norm(noise, axis=1)[:, None]
    planted = unit[base_idx] + 0.33 * noise
    pids = ids.max() + 1 + np.arange(m)
    cos_true = np.round(
        (unit[base_idx] * planted).sum(axis=1)
        / np.linalg.norm(planted, axis=1),
        6,
    )
    planted_truth = {
        (int(ids[base_idx[j]]), int(pids[j]))
        for j in range(m)
        if cos_true[j] >= 0.9
    }
    aug = spark.createDataFrame(
        [(int(ids[i]), [float(x) for x in mat[i]]) for i in range(n)]
        + [
            (int(pids[j]), [float(x) for x in planted[j]])
            for j in range(m)
        ],
        "vec_id long, embedding array<double>",
    )
    aug_found = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucketed_neardup_det(aug, threshold=THRESHOLD).collect()
    }
    planted_hits = sum(1 for p in planted_truth if p in aug_found)
    planted_recall = planted_hits / max(1, len(planted_truth))

    # --- IVF recall@10 vs exact numpy ground truth, per probe radius,
    # for BOTH layouts (round 7, VERDICT r6 #5): the historical fixed
    # 6-plane quantizer and the count-aware occupancy-invariant one.
    # scan_frac = fraction of cells probed (= expected corpus fraction
    # scanned for a sign quantizer): the count-aware layout must match
    # fixed-layout recall at a comparable or lower scan fraction.
    from math import comb

    from bigdataminingproject_spark.operators.similarity import (
        semantic_cell_planes,
    )

    truth_knn = _true_knn(ids, mat, query_idx)
    queries = vecs.filter(
        F.col("vec_id").isin(sorted(query_ids))
    )
    p_auto = semantic_cell_planes(n)
    ivf_layouts = {}
    for label, planes in (("fixed6", 6), ("auto", p_auto)):
        by_radius = {}
        for radius in (1, 2, 3, 4):
            got = {}
            for r in ivf_knn_det(
                vecs,
                queries,
                k=K,
                n_cell_planes=planes,
                hamming_radius=radius,
            ).collect():
                got.setdefault(r["query_id"], []).append(r["neighbor_id"])
            hits = [
                len(set(got.get(q, [])) & set(tk)) / len(tk)
                for q, tk in truth_knn.items()
            ]
            probed = sum(comb(planes, r) for r in range(radius + 1))
            by_radius[radius] = {
                "recall": round(float(np.mean(hits)), 4),
                "scan_frac": round(probed / (1 << planes), 4),
            }
        ivf_layouts[label] = {"planes": planes, "by_radius": by_radius}

    # --- Routed DEFAULT path recall (VERDICT r7 #4): knn_default is
    # exact brute force below the 10k index threshold and PQ-ADC +
    # count-aware exact re-rank above it. Ground truth is exact L2 (the
    # PQ family's metric) over the PQ_NQ probe queries, computed here
    # in numpy. rerank_scan_frac is the documented operating point: the
    # corpus fraction whose FULL vectors the re-rank stage reads (codes
    # are read for the rest).
    from bigdataminingproject_spark.operators.pq import (
        KNN_DEFAULT_EXACT_MAX,
        PQ_NQ,
        PQ_RERANK_R,
        knn_default,
    )

    idpos = {int(v): i for i, v in enumerate(ids)}
    dq = [q for q in range(PQ_NQ) if q in idpos]
    d_truth = {}
    for q in dq:
        qi = idpos[q]
        d2 = np.round(((mat - mat[qi]) ** 2).sum(axis=1), 6)
        d2[qi] = np.inf
        order = np.lexsort((ids, d2))
        d_truth[q] = [int(ids[j]) for j in order[:K]]
    d_got = {}
    for r in knn_default(spark, vecs).collect():
        d_got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    d_hits = [
        len(set(d_got.get(q, [])) & set(tk)) / len(tk)
        for q, tk in d_truth.items()
    ]
    branch = "exact" if n < KNN_DEFAULT_EXACT_MAX else "pq_rerank"
    default_path = {
        "branch": branch,
        "recall_at_10": round(float(np.mean(d_hits)), 4),
        "rerank_scan_frac": (
            None
            if branch == "exact"
            else round(max(PQ_RERANK_R, -(-n // 10)) / n, 4)
        ),
        "queries": len(d_truth),
    }

    return {
        "dir": sf_dir,
        "n": n,
        "default_path": default_path,
        "lsh_recall": round(lsh_recall, 4),
        "lsh_found_pairs": len(got_pairs),
        "lsh_true_pairs": len(truth_pairs),
        "lsh_recall_by_cosine": regimes,
        "lsh_planted_neardup_recall": round(planted_recall, 4),
        "lsh_planted_pairs": len(planted_truth),
        "ivf_layouts": ivf_layouts,
        "queries": len(truth_knn),
    }


def main() -> None:
    from bigdataminingproject_spark.session import get_spark

    dirs = sys.argv[1:] or [
        d
        for d in ("/root/testdata/sf0.1", "/tmp/bdmp_scale_probe_10x")
        if os.path.isdir(d)
    ]
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(measure(spark, d)))


if __name__ == "__main__":
    main()
