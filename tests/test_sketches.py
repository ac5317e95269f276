"""Sketch parity layer: error-bound property tests (SURVEY.md §5 item 1)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.sketches import (
    Dgim,
    approx_distinct_tokens,
    approx_duplicate_prefilter,
    build_bloom,
    build_cms,
    cms_estimates,
)


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    present = [f"key_{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in present], "k string")
    bloom = build_bloom(df, "k", expected_items=2000, fpp=0.01)
    assert all(bloom.mightContain(k) for k in present)
    absent = [f"missing_{i}" for i in range(2000)]
    fpr = sum(bloom.mightContain(k) for k in absent) / len(absent)
    assert fpr <= 0.02  # ≤ 2x nominal


def test_cms_overestimates_within_bound(spark):
    rng = random.Random(7)
    items = [f"tok_{rng.randint(0, 99)}" for _ in range(10_000)]
    truth: dict[str, int] = {}
    for it in items:
        truth[it] = truth.get(it, 0) + 1
    df = spark.createDataFrame([(i,) for i in items], "t string")
    cms = build_cms(df, "t", eps=0.005)
    est = cms_estimates(cms, list(truth))
    n = len(items)
    for tok, true_count in truth.items():
        assert est[tok] >= true_count  # CMS never underestimates
        assert est[tok] <= true_count + 0.005 * n + 1


def test_cms_merge_is_distributive(spark):
    a = spark.createDataFrame([("x",)] * 60 + [("y",)] * 10, "t string")
    b = spark.createDataFrame([("x",)] * 40, "t string")
    ca = build_cms(a, "t")
    cb = build_cms(b, "t")
    ca.mergeInPlace(cb)
    assert ca.estimateCount("x") >= 100
    assert ca.estimateCount("y") >= 10


def test_bloom_prefilter_flags_seen_text(spark):
    corpus = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(100)],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(0, "Document   NUMBER 5"), (1, "never seen before text")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["maybe_duplicate"]
        for r in approx_duplicate_prefilter(corpus, cands).collect()
    }
    assert out[0] is True  # normalized match — no false negatives
    # out[1] is *probably* False (fpp 1%); don't assert hard


def test_hll_distinct_tokens(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma alpha",), ("beta delta",)], "text string"
    )
    est = approx_distinct_tokens(
        df, F.split(F.col("text"), " ")
    ).first()["approx_distinct_tokens"]
    assert 4 <= est <= 5  # truth is 4


# --- DGIM properties --------------------------------------------------------

def _run_dgim(bits, window):
    d = Dgim(window=window)
    for b in bits:
        d.tick()
        d.add(b)
    return d


def test_dgim_exact_when_no_merges():
    # two size-1 buckets: estimate = 1 + (1 - 1//2) = 2 = truth
    d = _run_dgim([1, 0, 0, 1, 0], window=10)
    assert d.count() == 2


def test_dgim_halves_oldest_after_merge():
    # three 1s force a merge into a size-2 oldest bucket; the standard
    # DGIM estimate discounts half of it: 1 + 2 - 2//2 = 2 (truth 3, within
    # the ≤50%-of-oldest-bucket bound)
    d = _run_dgim([1, 0, 1, 1, 0], window=10)
    assert d.count() == 2


def test_dgim_error_bound_random_streams():
    rng = random.Random(42)
    for trial in range(20):
        window = 50
        bits = [rng.random() < 0.4 for _ in range(300)]
        d = _run_dgim(bits, window)
        for k in (10, 25, 50):
            true = sum(bits[-k:])
            est = d.count(k)
            # DGIM bound: off by at most half the oldest bucket ⇒ ≤ 50%
            assert abs(est - true) <= max(1, true * 0.5), (
                trial,
                k,
                true,
                est,
            )


def test_dgim_expires_old_events():
    d = _run_dgim([1] * 100, window=50)
    assert d.count() <= 50 * 1.5
    d2 = _run_dgim([1] * 50 + [0] * 50, window=50)
    assert d2.count() <= 25  # all ones fell out ± straddling error


def test_dgim_state_roundtrip():
    d = _run_dgim([1, 1, 0, 1] * 30, window=50)
    flat = d.to_state()
    d2 = Dgim.from_state(50, flat)
    assert d2.count() == d.count()
    d.tick(), d.add(1)
    d2.tick(), d2.add(1)
    assert d2.count() == d.count()


def test_misra_gries_guarantee_single_stream():
    """Every item with frequency > n/k is in the summary, and counters
    never overestimate / underestimate by more than n/k."""
    from collections import Counter

    from bigdataminingproject_spark.operators.sketches import MisraGries

    stream = (["hot"] * 400 + ["warm"] * 150 + [f"cold{i}" for i in range(450)])
    mg = MisraGries(k=10)
    for x in stream:
        mg.add(x)
    n = len(stream)
    truth = Counter(stream)
    for item, true_c in truth.items():
        if true_c > n / 10:
            assert item in mg.counters, item
    for item, est in mg.counters.items():
        assert est <= truth[item]
        assert truth[item] - est <= n / 10


def test_misra_gries_merge_preserves_guarantee():
    from collections import Counter

    from bigdataminingproject_spark.operators.sketches import MisraGries

    a_stream = ["x"] * 300 + [f"a{i}" for i in range(300)]
    b_stream = ["x"] * 200 + ["y"] * 250 + [f"b{i}" for i in range(250)]
    a, b = MisraGries(8), MisraGries(8)
    for s in a_stream:
        a.add(s)
    for s in b_stream:
        b.add(s)
    m = a.merge(b)
    n = len(a_stream) + len(b_stream)
    truth = Counter(a_stream + b_stream)
    assert len(m.counters) < 8
    for item, true_c in truth.items():
        if true_c > n / 8:
            assert item in m.counters, item
    for item, est in m.counters.items():
        assert est <= truth[item]


def test_misra_gries_distributed_build(spark, sf_dir):
    """treeReduce build over the real token stream: the summary's
    candidate set contains every exact above-threshold token."""
    from bigdataminingproject_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )
    from bigdataminingproject_spark.operators.sketches import (
        build_misra_gries,
    )
    from bigdataminingproject_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(remove_stopwords(tokenize(F.col("text")))).alias("w")
    )
    k = 20
    mg = build_misra_gries(toks.repartition(8), "w", k=k)
    exact = {r["w"]: r["c"] for r in toks.groupBy("w").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())
    for w, c in exact.items():
        if c > n / k:
            assert w in mg.counters, w
    for w, est in mg.counters.items():
        assert est <= exact[w]


def test_histogram_quantiles_within_bin_width_of_rank_value(spark, sf_dir):
    """Estimates land within one bin width of the DISCRETE rank-ceil(qn)
    value — the estimator's contract. (Interpolated percentile can sit
    a whole rank away, which in a sparse tail is an unbounded value
    gap — see the grouped test.)"""
    import math

    from bigdataminingproject_spark.operators.sketches import (
        histogram_quantiles,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    vals = sorted(r["value"] for r in ev.select("value").collect())
    width = (vals[-1] - vals[0]) / 256
    est = {
        r["quantile"]: r["estimate"]
        for r in histogram_quantiles(ev, "value").collect()
    }
    for q in (0.5, 0.9, 0.99):
        rank_val = vals[math.ceil(q * len(vals)) - 1]
        assert abs(est[q] - rank_val) <= width, (q, est[q], rank_val)


def test_histogram_quantiles_degenerate_inputs(spark):
    from bigdataminingproject_spark.operators.sketches import (
        histogram_quantiles,
    )

    empty = spark.createDataFrame([], "value double")
    out = histogram_quantiles(empty, "value").collect()
    assert all(r["estimate"] is None for r in out)
    const = spark.createDataFrame([(5.0,)] * 10, "value double")
    out = histogram_quantiles(const, "value").collect()
    assert all(r["estimate"] == 5.0 for r in out)


def test_grouped_histogram_quantiles_per_key(spark, sf_dir):
    """Per-key estimates land within one bin width of each key's
    discrete rank-ceil(qn) value (the estimator's contract — the
    INTERPOLATED percentile of a ~200-row key can sit a whole sparse
    tail-gap away at p99, which is a property of the definition, not
    an estimator error)."""
    import math

    from bigdataminingproject_spark.operators.sketches import (
        grouped_histogram_quantiles,
    )
    from bigdataminingproject_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    by_key: dict[str, list] = {}
    for r in ev.select("event_type", "value").collect():
        by_key.setdefault(r["event_type"], []).append(r["value"])
    out = grouped_histogram_quantiles(ev, "event_type", "value").collect()
    assert len(out) == 3 * len(by_key)
    for r in out:
        vals = sorted(by_key[r["key"]])
        width = (vals[-1] - vals[0]) / 256
        rank_val = vals[math.ceil(r["quantile"] * len(vals)) - 1]
        assert abs(r["estimate"] - rank_val) <= width + 1e-9, (
            r["key"], r["quantile"], r["estimate"], rank_val)


def test_grouped_histogram_quantiles_constant_key(spark):
    from bigdataminingproject_spark.operators.sketches import (
        grouped_histogram_quantiles,
    )

    df = spark.createDataFrame(
        [("a", 5.0)] * 4 + [("b", float(i)) for i in range(100)],
        "k string, v double",
    )
    out = {
        (r["key"], r["quantile"]): r["estimate"]
        for r in grouped_histogram_quantiles(df, "k", "v").collect()
    }
    assert out[("a", 0.5)] == 5.0 and out[("a", 0.99)] == 5.0
    assert 40 <= out[("b", 0.5)] <= 60


def test_cms_join_size_never_underestimates(spark):
    """CMS counters only over-count under collisions, so the inner-
    product estimate is a one-sided bound: est >= exact, always."""
    from bigdataminingproject_spark.operators.sketches import (
        q_join_size_estimate,
    )

    row = q_join_size_estimate(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["est_rows"] >= row["exact_rows"]
    assert row["overestimate_pct"] >= 0.0


def test_cms_join_width_is_count_aware(spark):
    """Width doubles with the smaller side (power-of-two, >= 4*min) —
    the auto-sizing contract the oracle re-derives."""
    from bigdataminingproject_spark.operators.sketches import (
        cms_join_width,
    )

    assert cms_join_width(15_000, 1_500) == 8192  # 4*1500 -> 2^13
    assert cms_join_width(150_000, 15_000) == 65536
    assert cms_join_width(5, 1) == 8  # floor via max(2, ...)
    for nf, nd in ((100, 50), (10**6, 10**5)):
        w = cms_join_width(nf, nd)
        assert w >= 4 * min(nf, nd) and w & (w - 1) == 0


def test_cms_join_size_error_is_bounded(spark):
    """At width >= 4*min-side the expected overestimate for the FK
    join is ~25%; pin a loose 100% ceiling so a broken hash or width
    regression (which sends the estimate to many multiples of exact)
    is loud without making the bound flaky."""
    from bigdataminingproject_spark.operators.sketches import (
        q_join_size_estimate,
    )

    row = q_join_size_estimate(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["overestimate_pct"] <= 100.0, row


def test_bloom_join_prune_keeps_all_matches_and_prunes_rest(spark):
    """No false negatives: every fact row with a real dim match must
    survive the bloom prune; false positives stay under a loose
    multiple of the configured fpp (statistical, seeded by sha256
    determinism so the assertion is stable)."""
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.sketches import (
        bloom_join_prune,
    )

    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    dim = spark.range(0, 5000, 10).select(F.col("id").alias("dk"))
    kept = bloom_join_prune(fact, "k", dim, "dk", fpp=0.01).collect()
    kept_keys = {r["k"] for r in kept}
    matches = set(range(0, 5000, 10))
    assert matches <= kept_keys  # zero false negatives
    extras = len(kept_keys - matches)
    assert extras <= 0.05 * 4500, extras  # fpp 1% with slack


def test_bloom_join_prune_empty_dim_drops_everything(spark):
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.sketches import (
        bloom_join_prune,
    )

    fact = spark.range(0, 100).select(F.col("id").alias("k"))
    dim = spark.range(0).select(F.col("id").alias("dk"))
    assert bloom_join_prune(fact, "k", dim, "dk").count() == 0


def test_sampled_join_size_reasonable_and_deterministic(spark):
    """Correlated sampling on a uniform FK join: estimate within a
    loose band of truth (the sample is a pure hash function, so this
    is a fixed number, not a flaky draw), and a repeat run returns
    the identical row."""
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.sketches import (
        sampled_join_size,
    )

    left = spark.range(0, 20000).select((F.col("id") % 2000).alias("k"))
    right = spark.range(0, 2000).select(F.col("id").alias("k"))
    r1 = sampled_join_size(spark, left, right, "k", "k").collect()[0]
    r2 = sampled_join_size(spark, left, right, "k", "k").collect()[0]
    assert r1 == r2
    assert r1["exact_pairs"] == 20000
    assert abs(r1["est_pairs"] - 20000) <= 10000  # within 50% at p=1/64


def test_sampled_join_size_empty_join(spark):
    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.sketches import (
        sampled_join_size,
    )

    left = spark.range(0, 100).select(F.col("id").alias("k"))
    right = spark.range(1000, 1100).select(F.col("id").alias("k"))
    r = sampled_join_size(spark, left, right, "k", "k").collect()[0]
    assert r["exact_pairs"] == 0 and r["est_pairs"] == 0
    assert r["err_pct"] == 0.0
