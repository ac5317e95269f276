"""Deterministic stratified sampling, benchmark contamination, and
cohort retention — the round-2 training-pipeline additions.

Sampling has no reference counterpart (north-star data-mixing op);
contamination mirrors the shingle semantics of the dup detector
(reference streaming/detectors/duplicate_detector.py:44-61) applied
corpus-vs-benchmark; retention is the canonical events rollup.
"""

from __future__ import annotations

import datetime
import pytest
import hashlib

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.dedup import benchmark_contamination
from bigdataminingproject_spark.operators.events import cohort_retention
from bigdataminingproject_spark.operators.sampling import (
    hash_uniform,
    sample_summary,
    stratified_sample,
)


def _py_uniform(x) -> float:
    """Python twin of hash_uniform — md5 first 8 hex chars / 2^32."""
    h = hashlib.md5(str(x).encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def test_hash_uniform_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", hash_uniform(F.col("doc_id")).alias("u")
        ).collect()
    }
    for i in range(50):
        assert got[i] == _py_uniform(i)


def test_stratified_sample_membership_is_deterministic(spark):
    rows = [(i, "srcA" if i % 2 == 0 else "srcB", "t") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rates = {"srcA": 0.5}
    kept = stratified_sample(df, rates, default_rate=0.1)
    expected = {
        i
        for i, s, _ in rows
        if _py_uniform(i) < (0.5 if s == "srcA" else 0.1)
    }
    got = {r["doc_id"] for r in kept.collect()}
    assert got == expected
    # layout-independent: same membership after a reshuffle
    got2 = {
        r["doc_id"] for r in stratified_sample(
            df.repartition(7), rates, default_rate=0.1
        ).collect()
    }
    assert got2 == expected


def test_sample_summary_checksum(spark):
    rows = [(i, "s0", "t") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sample_summary(df, {}, default_rate=0.3).collect()
    assert len(out) == 1
    kept = [i for i in range(100) if _py_uniform(i) < 0.3]
    assert out[0]["n_total"] == 100
    assert out[0]["n_kept"] == len(kept)
    assert out[0]["kept_id_checksum"] == sum(kept)


def test_rate_edges_keep_all_and_none(spark):
    df = spark.createDataFrame(
        [(i, "s", "t") for i in range(64)],
        "doc_id long, source string, text string",
    )
    assert stratified_sample(df, {}, default_rate=1.0).count() == 64
    assert stratified_sample(df, {}, default_rate=0.0).count() == 0


def test_benchmark_contamination_counts(spark):
    # bench doc 0 shares shingles with 1 (verbatim) and 2 (one shingle);
    # doc 3 is disjoint. Self-pairs excluded.
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),
        (2, "x alpha beta gamma"),
        (3, "one two three four"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r["bench_id"]: r for r in benchmark_contamination(docs, bench).collect()}
    assert set(out) == {0}
    assert out[0]["n_contaminated"] == 2
    # doc 1 shares both shingles of doc 0
    assert out[0]["max_shared"] == 2


def test_benchmark_contamination_no_shared_is_empty(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 0)
    assert benchmark_contamination(docs, bench).count() == 0


def test_cohort_retention(spark):
    d0 = datetime.datetime(2024, 1, 1, 10)
    rows = [
        # user 1: cohort day 0, returns day 1 twice (counted once) + day 9
        (1, d0),
        (1, d0 + datetime.timedelta(days=1)),
        (1, d0 + datetime.timedelta(days=1, hours=2)),
        (1, d0 + datetime.timedelta(days=9)),
        # user 2: same cohort day, only day 0
        (2, d0 + datetime.timedelta(hours=5)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort_day"].day, r["day_offset"]): r["n_users"]
        for r in cohort_retention(ev, max_offset=7).collect()
    }
    assert out == {(1, 0): 2, (1, 1): 1}  # day 9 beyond max_offset


def test_mixture_plan_rates(spark):
    from bigdataminingproject_spark.operators.sampling import mixture_plan

    # src "a": 4 tokens weight 1; src "b": 12 tokens weight 3 →
    # total 16 tokens, total weight 4.
    docs = spark.createDataFrame(
        [
            (0, "a", "w x y z"),
            (1, "b", "p q r s t u"),
            (2, "b", "p q r s t u"),
        ],
        "doc_id long, source string, text string",
    )
    w = F.when(F.col("source") == "b", 3).otherwise(1)
    out = {r.source: r for r in mixture_plan(docs, w).collect()}
    assert out["a"].target_bp == 2500  # weight 1/4
    assert out["b"].target_bp == 7500
    # rate = target_share * total_tokens / source_tokens
    assert out["a"].rate_bp == 10000  # 0.25 * 16 / 4 = 1.0
    assert out["b"].rate_bp == 10000  # 0.75 * 16 / 12 = 1.0
    assert out["b"].n_docs == 2 and out["b"].n_tokens == 12


def test_mixture_plan_oversample(spark):
    from bigdataminingproject_spark.operators.sampling import mixture_plan

    # rare source with high weight must be up-sampled (> 10000 bp)
    docs = spark.createDataFrame(
        [(0, "rare", "a b"), (1, "big", " ".join("t%d" % i for i in range(18)))],
        "doc_id long, source string, text string",
    )
    w = F.when(F.col("source") == "rare", 1).otherwise(1)
    out = {r.source: r for r in mixture_plan(docs, w).collect()}
    # rare: share 0.5 of 20 tokens = 10 target vs 2 present → 5x
    assert out["rare"].rate_bp == 50000


def test_length_buckets_edges(spark):
    from bigdataminingproject_spark.operators.packing import length_buckets

    docs = spark.createDataFrame(
        [
            (0, "a b c"),                      # 3  → bucket 4
            (1, "a b c d"),                    # 4  → bucket 4 (inclusive)
            (2, "a b c d e"),                  # 5  → bucket 8
            (3, " ".join(["t"] * 99)),         # 99 → overflow -1
        ],
        "doc_id long, text string",
    )
    out = {r.bucket: r for r in length_buckets(docs, edges=(4, 8)).collect()}
    assert out[4].n_docs == 2 and out[4].n_tokens == 7
    assert out[8].n_docs == 1
    assert out[-1].n_docs == 1 and out[-1].n_tokens == 99


def test_domain_cap_keeps_best_per_source(spark):
    from bigdataminingproject_spark.operators.sampling import domain_cap

    rows = [
        (1, "a", "x" * 50),
        (2, "a", "x" * 90),
        (3, "a", "x" * 70),
        (4, "b", "x" * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = domain_cap(docs, cap=2).collect()
    got = [(r["source"], r["doc_id"], r["rnk"]) for r in out]
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 4, 1)]


def test_domain_cap_tiebreak_is_id(spark):
    from bigdataminingproject_spark.operators.sampling import domain_cap

    rows = [(i, "a", "same length") for i in (5, 3, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = domain_cap(docs, cap=2).collect()
    assert [r["doc_id"] for r in out] == [3, 5]


def test_token_budget_sample_respects_budget_and_md5_order(spark):
    import hashlib

    from bigdataminingproject_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [(i, "a", "tok " * 10) for i in range(20)]  # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(docs, budget=35).collect()
    # 10-token docs into a 35 budget -> exactly 3 docs kept
    assert [r["cum_tokens"] for r in out] == [10, 20, 30]
    expected = sorted(range(20), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:3]
    assert [r["doc_id"] for r in out] == expected


def test_doc_shards_partitions_everything_exactly_once(spark, sf_dir):
    from bigdataminingproject_spark.operators.sampling import doc_shards
    from bigdataminingproject_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    ids = docs.agg(F.sum("doc_id")).collect()[0][0]
    out = doc_shards(docs, n_shards=8).collect()
    assert sum(r["n_docs"] for r in out) == total
    assert sum(r["id_checksum"] for r in out) == ids
    assert len(out) <= 8 and len({r["shard"] for r in out}) == len(out)


def test_tfidf_topk_ranks_rare_terms_first(spark):
    from bigdataminingproject_spark.operators.frequency import tfidf_topk

    rows = [
        (1, "a", "zebra zebra common"),
        (2, "a", "common filler words"),
        (3, "a", "common words again"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = tfidf_topk(docs, k=1).collect()
    top = {r["doc_id"]: r["token"] for r in out}
    # 'zebra' (df=1, tf=2) dominates doc 1; 'common' (df=3) never wins
    assert top[1] == "zebra"
    assert all(t != "common" for t in top.values())


def test_bm25_matches_python_recompute(spark):
    """Exact recompute of Okapi BM25 on a small corpus."""
    import math
    from collections import Counter

    from bigdataminingproject_spark.operators.frequency import bm25_topk

    texts = {
        1: "join join join vector",
        2: "stream filter scan sort",
        3: "vector vector stream join extra words here",
        4: "no matching terms at all",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    q = ["join", "vector", "stream"]
    toks = {i: t.split() for i, t in texts.items()}
    n = len(toks)
    tot_dl = sum(len(ws) for ws in toks.values())
    df = Counter(t for t in q for ws in toks.values() if t in ws)

    def score(ws):
        dl, tf = len(ws), Counter(ws)
        s = 0.0
        for t in q:
            if tf[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf[t] * 2.2 / (
                tf[t] + 1.2 * (0.25 + 0.75 * dl * n / tot_dl)
            )
        return round(s, 4)

    got = [
        (r["doc_id"], r["bm25"], r["n_matched_terms"], r["dl"])
        for r in bm25_topk(docs, q, k=10).collect()
    ]
    assert [g[0] for g in got] == sorted(
        (d for d in toks if d != 4),
        key=lambda d: (-score(toks[d]), d),
    )
    for d, s, m, dl in got:
        assert s == pytest.approx(score(toks[d]), abs=1e-9)
        assert m == sum(1 for t in q if t in toks[d])
        assert dl == len(toks[d])


def test_bm25_topk_cut_is_deterministic(spark):
    """Boundary ties cut by doc_id: equal-scoring docs keep the lower id."""
    from bigdataminingproject_spark.operators.frequency import bm25_topk

    rows = [(i, "join vector pad pad pad") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [r["doc_id"] for r in bm25_topk(docs, ["join"], k=4).collect()]
    assert got == [0, 1, 2, 3]


def test_dsir_weights_tilt_toward_target(spark):
    """Docs resembling the target slice score higher than docs from the
    background distribution; recompute one doc exactly."""
    import math
    from collections import Counter

    from bigdataminingproject_spark.operators.sampling import dsir_logweights

    target_text = "clean prose about careful reasoning and clear writing"
    noise_text = "zz xx qq ww vv uu tt ss rr"
    rows = (
        [(i, "tgt", target_text) for i in range(5)]
        + [(10 + i, "raw", target_text) for i in range(3)]  # target-like
        + [(20 + i, "raw", noise_text) for i in range(3)]  # background
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {r["doc_id"]: r["logw"] for r in dsir_logweights(docs, ["tgt"]).collect()}
    assert out[10] > out[20]  # target-like raw doc outranks noise doc

    # exact recompute for doc 20 (pure background)
    all_toks = [t for _, _, txt in rows for t in txt.split()]
    tgt_toks = [t for _, s, txt in rows if s == "tgt" for t in txt.split()]
    rc, tc = Counter(all_toks), Counter(tgt_toks)
    v, rt, tt = len(rc), len(all_toks), len(tgt_toks)
    ws = noise_text.split()
    expect = round(
        sum(
            math.log((tc[w] + 1.0) / (tt + v))
            - math.log((rc[w] + 1.0) / (rt + v))
            for w in ws
        )
        / len(ws),
        4,
    )
    assert out[20] == pytest.approx(expect, abs=1e-9)


def test_apply_mixture_copy_semantics(spark):
    """Up-sampled sources get floor(rate/1e4) copies (+1 by variate);
    down-sampled sources keep a subset with exactly 1 copy; achieved
    doc mass tracks the rate in aggregate."""
    from bigdataminingproject_spark.operators.sampling import (
        apply_mixture,
        mixture_plan,
    )
    from pyspark.sql import functions as F

    rows = []
    # heavy: 300 docs of 10 tokens; light: 30 docs of 10 tokens
    for i in range(300):
        rows.append((i, "tok " * 10, "heavy"))
    for i in range(300, 330):
        rows.append((i, "tok " * 10, "light"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    w = F.when(F.col("source") == "light", F.lit(5)).otherwise(F.lit(1))
    plan = {r["source"]: r for r in mixture_plan(docs, w).collect()}
    out = apply_mixture(docs, w).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["n_copies"])
    # light is up-sampled: every kept doc has >= floor(rate) copies
    lr = plan["light"]["rate_bp"]
    assert lr > 10000
    assert all(c >= lr // 10000 for c in by_src["light"])
    assert len(by_src["light"]) == 30  # up-sampling never drops docs
    # heavy is down-sampled: single copies, subset kept
    hr = plan["heavy"]["rate_bp"]
    assert hr < 10000
    assert all(c == 1 for c in by_src["heavy"])
    kept = len(by_src["heavy"])
    assert abs(kept - 300 * hr / 10000) < 50  # variate noise envelope
    # determinism
    again = apply_mixture(docs, w).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# --- weighted sampling without replacement (round 7) ------------------------

def test_weighted_sample_is_deterministic_and_bounded(spark):
    from bigdataminingproject_spark.operators.sampling import (
        weighted_sample_wor,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(f"d{i:03d}", "s" + str(i % 3), "x" * (10 + i)) for i in range(60)],
        "doc_id string, source string, text string",
    )
    w = F.length("text").cast("double")
    a = weighted_sample_wor(docs, 5, w, group_col="source")
    b = weighted_sample_wor(docs, 5, w, group_col="source")
    rows_a = sorted((r["source"], r["doc_id"], r["rnk"]) for r in a.collect())
    rows_b = sorted((r["source"], r["doc_id"], r["rnk"]) for r in b.collect())
    assert rows_a == rows_b  # pure function of the data
    per_group = {}
    for s, _, _ in rows_a:
        per_group[s] = per_group.get(s, 0) + 1
    assert all(v == 5 for v in per_group.values())


def test_weighted_sample_prefers_heavy_rows(spark):
    from bigdataminingproject_spark.operators.sampling import (
        weighted_sample_wor,
    )
    from pyspark.sql import functions as F

    # one row carries 10_000x the weight of 99 light rows: under
    # ES-keys P(exclude from a 10-of-100 sample) is astronomically
    # small for any fixed hash draw that isn't pathological
    rows = [(f"d{i:03d}", 1.0 if i else 10000.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    got = {
        r["doc_id"]
        for r in weighted_sample_wor(
            df, 10, F.col("w"), id_col="doc_id"
        ).collect()
    }
    assert "d000" in got and len(got) == 10


def test_sample_partials_fold_to_batch_sample(spark):
    """Top-k closure under disjoint union: folding per-chunk partials
    (in any grouping) must land exactly on the batch sample — the
    invariant the streaming maintenance twin rides."""
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.sampling import (
        finish_weighted_sample,
        fold_sample_partials,
        weighted_sample_partial,
        weighted_sample_wor,
    )

    docs = spark.createDataFrame(
        [
            (i, "s" + str(i % 2), "y" * (5 + (i * 7) % 90))
            for i in range(80)
        ],
        "doc_id long, source string, text string",
    )
    w = F.greatest(F.lit(1), F.length("text")).cast("double")
    batch = weighted_sample_wor(docs, 20, w, group_col="source").select(
        "source", "doc_id", F.col("_w").cast("bigint").alias("weight"), "rnk"
    )
    # 4 disjoint chunks -> partials -> unbalanced fold (((p0+p1)+p2)+p3)
    parts = [
        weighted_sample_partial(
            docs.filter((F.col("doc_id") % 4) == i), w
        )
        for i in range(4)
    ]
    acc = parts[0]
    for p in parts[1:]:
        acc = fold_sample_partials(acc.unionByName(p))
    streamed = finish_weighted_sample(acc)
    assert sorted(map(tuple, batch.collect())) == sorted(
        map(tuple, streamed.collect())
    )
