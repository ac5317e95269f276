"""Sketch parity layer (SURVEY.md Phase 5 — reference A1-A5).

The reference is built ON sketches (Bloom / Count-Min / DGIM) because a
single Python process can't hold exact state. On Spark, exact operators
scale out, so sketches here are a *choice* for driver-side summaries and
bounded streaming state (SURVEY.md §4):

- Bloom (A1): ``DataFrame.stat.bloomFilter`` — Spark's mergeable JVM
  implementation, used for approximate membership / approximate dedup
  pre-filtering.
- Count-Min (A2/A3): ``DataFrame.stat.countMinSketch`` — mergeable, same
  (eps, delta) error model as the reference's
  (``count_min_sketch.py:12-14``: est ≤ true + eps·N w.p. ≥ 1-delta).
- DGIM (A4/A5): implemented fresh from the published algorithm
  (Datar-Gionis-Indyk-Motwani, "Maintaining Stream Statistics over
  Sliding Windows", SODA 2002) for count-based windows in streaming
  parity mode; batch mode uses exact window counts instead.
- HLL: ``approx_count_distinct`` for distinct-token estimates (A12 at
  scale).

Defaults mirror the reference detectors: Bloom capacity 100k / fpp 0.01
(duplicate_detector.py:28-29), CMS eps 0.005 / delta 1e-3
(frequency_detector.py:18-19).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from bigdataminingproject_spark.functions.lits import lit_array

BLOOM_CAPACITY = 100_000
BLOOM_FPP = 0.01
CMS_EPS = 0.005
CMS_DELTA = 1e-3
CMS_SEED = 1


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int = BLOOM_CAPACITY,
    fpp: float = BLOOM_FPP,
):
    """A1: distributed-build, driver-held mergeable Bloom filter.

    Spark's BloomFilter aggregation is Scala-only (org.apache.spark.util
    .sketch.BloomFilter via Dataset.stat.bloomFilter); PySpark reaches it
    through the JVM gateway. The build runs as a distributed aggregate;
    the returned (py4j-wrapped) filter supports mightContain/mergeInPlace.
    """
    return df._jdf.stat().bloomFilter(col, int(expected_items), float(fpp))


def build_cms(
    df: DataFrame,
    col: str,
    eps: float = CMS_EPS,
    confidence: float = 1.0 - CMS_DELTA,
    seed: int = CMS_SEED,
):
    """A2: distributed-build Count-Min sketch (mergeInPlace-able, A3).

    Same JVM-gateway situation as ``build_bloom`` — Dataset.stat
    .countMinSketch is Scala-only. Error model identical to the
    reference's: est ≤ true + eps·N with prob ≥ confidence.
    """
    return df._jdf.stat().countMinSketch(
        col, float(eps), float(confidence), int(seed)
    )


def cms_estimates(cms, terms: list[str]) -> dict[str, int]:
    """A9 approximate variant: point frequency estimates from the CMS."""
    return {t: int(cms.estimateCount(t)) for t in terms}


class PyBloom:
    """Minimal mergeable Bloom filter for Python-side membership.

    Standard construction (Mitzenmacher & Upfal): optimal bit count
    m = -n·ln(p)/ln²2 and k = (m/n)·ln2 hash functions, realized with
    Kirsch-Mitzenmacher double hashing h1 + i·h2 over a sha256 digest.
    Fixed-size byte state ⇒ partial filters OR-merge associatively, which
    is what makes the distributed build below a treeReduce.
    """

    def __init__(self, capacity: int, fpp: float, bits: bytearray | None = None):
        import math

        self.capacity = capacity
        self.fpp = fpp
        self.m = max(8, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.k = max(1, round(self.m / capacity * math.log(2)))
        self.bits = bits if bits is not None else bytearray((self.m + 7) // 8)

    def _positions(self, item: str):
        import hashlib

        digest = hashlib.sha256(item.encode()).digest()
        h1 = int.from_bytes(digest[:8], "big")
        h2 = int.from_bytes(digest[8:16], "big") | 1
        for i in range(self.k):
            yield (h1 + i * h2) % self.m

    def add(self, item: str) -> None:
        for pos in self._positions(item):
            self.bits[pos >> 3] |= 1 << (pos & 7)

    def __contains__(self, item: str) -> bool:
        return all(
            self.bits[pos >> 3] & (1 << (pos & 7))
            for pos in self._positions(item)
        )

    def merge(self, other: "PyBloom") -> "PyBloom":
        merged = bytearray(a | b for a, b in zip(self.bits, other.bits))
        return PyBloom(self.capacity, self.fpp, merged)


def build_pybloom(
    df: DataFrame,
    col: str,
    expected_items: int = BLOOM_CAPACITY,
    fpp: float = BLOOM_FPP,
) -> PyBloom:
    """Distributed PyBloom build: per-partition partial filters OR-merged
    with treeReduce — fixed-size shuffle-free aggregation, the same
    partial+final shape as Spark's own sketch aggregates."""
    capacity, p = expected_items, fpp

    def partial(rows):
        b = PyBloom(capacity, p)
        for r in rows:
            v = r[0]
            if v is not None:
                b.add(v)
        yield bytes(b.bits)

    merged = (
        df.select(col)
        .rdd.mapPartitions(partial)
        .treeReduce(lambda a, b: bytes(x | y for x, y in zip(a, b)))
    )
    return PyBloom(capacity, p, bytearray(merged))


def approx_duplicate_prefilter(
    corpus: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    expected_items: int = BLOOM_CAPACITY,
    fpp: float = BLOOM_FPP,
) -> DataFrame:
    """A1→A10 approximate membership: flag candidate rows whose normalized
    fingerprint might already exist in ``corpus``.

    The Bloom filter is built distributed, then shipped to executors as a
    broadcast byte-array predicate — the 100 TB shape for "probably-seen"
    pruning before an exact (expensive) dedup join. False positives ≤
    fpp, no false negatives.
    """
    norm = F.md5(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    bloom = build_pybloom(
        corpus.select(norm.alias("fp")), "fp", expected_items, fpp
    )
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(
        (bytes(bloom.bits), expected_items, fpp)
    )

    @F.pandas_udf("boolean")
    def might_contain(fp: pd.Series) -> pd.Series:
        bits, cap, p = bc.value
        b = PyBloom(cap, p, bytearray(bits))
        return fp.map(lambda v: v in b)

    return candidates.withColumn("maybe_duplicate", might_contain(norm))


def bloom_join_prune(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    fpp: float = BLOOM_FPP,
) -> DataFrame:
    """Bloom-semi-join reduction: drop fact rows whose join key cannot
    match ``dim_keys`` BEFORE the join's shuffle. No false negatives
    (every matching row survives), ≤ fpp false positives (removed by
    the exact join that must follow) — so composing this in front of
    any equi-join is semantics-preserving, which is exactly what lets
    the registered query share a plain-join oracle.

    This is the runtime-filter pattern (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` injection, exposed as
    a composable operator): at 100 TB the build side is often too big
    to BROADCAST AS ROWS but its Bloom BITS are a few MB — build
    distributed (per-partition partials OR-merged shuffle-free,
    ``build_pybloom``), ship bits once, and the probe side sheds
    non-matching rows map-side so the sort-merge join's shuffle moves
    only survivors. Membership test is the one Python crossing,
    Arrow-vectorized (the approx_duplicate_prefilter pattern) — never
    row-at-a-time.
    """
    keys = dim_keys.select(
        F.col(dim_key).cast("string").alias("k")
    ).filter(F.col("k").isNotNull()).distinct()
    n_keys = keys.count()  # ONE driver long (build-side cardinality)
    if n_keys == 0:
        return fact.filter(F.lit(False))
    bloom = build_pybloom(keys, "k", expected_items=n_keys, fpp=fpp)
    spark = fact.sparkSession
    bc = spark.sparkContext.broadcast((bytes(bloom.bits), n_keys, fpp))

    @F.pandas_udf("boolean")
    def might_match(k: pd.Series) -> pd.Series:
        bits, cap, p = bc.value
        b = PyBloom(cap, p, bytearray(bits))
        return k.map(lambda v: v is not None and v in b)

    return fact.filter(might_match(F.col(fact_key).cast("string")))


def q_bloom_join_revenue(spark, sf_dir: str) -> DataFrame:
    """Discounted revenue per supplier nation for one region's
    suppliers, with the lineitem→supplier join BLOOM-PRUNED before its
    shuffle — the registered demonstration of bloom_join_prune in the
    regime it exists for: the exact join is forced to sort-merge (the
    too-big-to-broadcast dim at cluster scale), so the bits do the
    broadcast work and only surviving fact rows shuffle. The oracle is
    the PLAIN join — false positives are removed by the exact join, so
    the bloom stage is invisible to semantics.
    """
    from bigdataminingproject_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    dim = (
        sup.join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
                    nat["n_regionkey"] == reg["r_regionkey"],
                )
            ),
            sup["s_nationkey"] == nat["n_nationkey"],
        )
        .select("s_suppkey", "n_name")
    )
    pruned = bloom_join_prune(
        li.select("l_suppkey", "l_extendedprice", "l_discount"),
        "l_suppkey",
        dim,
        "s_suppkey",
    )
    joined = pruned.join(
        dim.hint("shuffle_merge"),
        pruned["l_suppkey"] == dim["s_suppkey"],
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def approx_distinct_tokens(
    df: DataFrame, tokens_col: Column, rsd: float = 0.05
) -> DataFrame:
    """A12 at scale: HLL distinct-token estimate (exact uses count_distinct)."""
    return df.select(F.explode(tokens_col).alias("token")).agg(
        F.approx_count_distinct("token", rsd).alias("approx_distinct_tokens")
    )


# --- DGIM: count-based sliding-window bit counting --------------------------

@dataclass
class Dgim:
    """DGIM sliding-window counter (Datar et al., SODA 2002).

    Maintains O(log² W) buckets of exponentially growing sizes over the
    last ``window`` events; ``count()`` over-/under-estimates by at most
    half the oldest contributing bucket (≤ 50% relative error bound from
    the paper; in practice far tighter).

    Used as per-key state inside ``applyInPandasWithState`` for the
    streaming parity of the reference's count-based windows (W2) — batch
    mode computes exact counts with window functions instead.
    """

    window: int
    max_per_size: int = 2
    clock: int = 0
    # list of (end_time, size), newest first
    buckets: list[tuple[int, int]] = field(default_factory=list)

    def tick(self) -> None:
        """Advance the logical clock by one event (bit = 0)."""
        self.clock += 1
        self._expire()

    def add(self, bit: int = 1) -> None:
        """Observe the current event's bit (call after tick())."""
        if not bit:
            return
        self.buckets.insert(0, (self.clock, 1))
        self._merge()

    def _expire(self) -> None:
        horizon = self.clock - self.window
        while self.buckets and self.buckets[-1][0] <= horizon:
            self.buckets.pop()

    def _merge(self) -> None:
        size = 1
        while True:
            same = [i for i, b in enumerate(self.buckets) if b[1] == size]
            if len(same) <= self.max_per_size:
                break
            # merge the two OLDEST buckets of this size
            i, j = same[-2], same[-1]
            newer_end = self.buckets[i][0]
            merged = (newer_end, size * 2)
            self.buckets[i] = merged
            del self.buckets[j]
            size *= 2

    def count(self, k: int | None = None) -> int:
        """Estimate ones among the last ``k`` (≤ window) events."""
        k = self.window if k is None else min(k, self.window)
        horizon = self.clock - k
        total = 0
        oldest_size = 0
        for end, size in self.buckets:
            if end > horizon:
                total += size
                oldest_size = size
        if oldest_size:
            total -= oldest_size // 2  # half the straddling bucket
        return total

    def to_state(self) -> list[int]:
        """Flatten for Spark state storage (list of ints)."""
        flat = [self.clock]
        for end, size in self.buckets:
            flat.extend((end, size))
        return flat

    @classmethod
    def from_state(cls, window: int, flat: list[int] | None) -> "Dgim":
        d = cls(window=window)
        if flat:
            d.clock = flat[0]
            d.buckets = [
                (flat[i], flat[i + 1]) for i in range(1, len(flat), 2)
            ]
        return d


class MisraGries:
    """Misra-Gries heavy-hitters summary (FOCS'82; SpaceSaving's
    deterministic ancestor): k-1 counters guarantee every item with true
    frequency > n/k survives in the summary, and each surviving counter
    underestimates its true count by at most (n - m)/k where m is the
    summary's own mass.

    Partial summaries MERGE (Agarwal et al., PODS'12): add counters
    pointwise, then subtract the (k)th-largest value from every counter
    and drop non-positives — the merged summary keeps the same error
    envelope, which is what makes the distributed build a treeReduce
    (same shuffle-free partial+final shape as the PyBloom build).
    """

    def __init__(self, k: int, counters: dict[str, int] | None = None):
        self.k = k
        self.counters: dict[str, int] = counters if counters is not None else {}

    def add(self, item: str) -> None:
        c = self.counters
        if item in c:
            c[item] += 1
        elif len(c) < self.k - 1:
            c[item] = 1
        else:
            dead = []
            for key in c:
                c[key] -= 1
                if c[key] == 0:
                    dead.append(key)
            for key in dead:
                del c[key]

    def merge(self, other: "MisraGries") -> "MisraGries":
        merged = dict(self.counters)
        for key, v in other.counters.items():
            merged[key] = merged.get(key, 0) + v
        if len(merged) >= self.k:
            # subtract the k-th largest, drop <= 0 (PODS'12 rule)
            kth = sorted(merged.values(), reverse=True)[self.k - 1]
            merged = {
                key: v - kth for key, v in merged.items() if v - kth > 0
            }
        return MisraGries(self.k, merged)


def build_misra_gries(df: DataFrame, col: str, k: int = 50) -> MisraGries:
    """Distributed Misra-Gries: per-partition summaries merged with
    treeReduce. The result is a deterministic function of the partition
    CONTENTS (merge is associative on the error envelope, though counter
    values may vary with merge order — the guarantee, not the exact
    counters, is the contract)."""

    def partial(rows):
        mg = MisraGries(k)
        for r in rows:
            v = r[0]
            if v is not None:
                mg.add(v)
        yield mg.counters

    def combine(a: dict, b: dict) -> dict:
        return MisraGries(k, dict(a)).merge(MisraGries(k, b)).counters

    merged = df.select(col).rdd.mapPartitions(partial).treeReduce(combine)
    return MisraGries(k, merged)


def histogram_quantiles(
    df: DataFrame,
    col: str,
    n_bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Bounded-memory quantile estimation via a fixed-grid histogram —
    the two-pass, no-sort percentile pattern for columns too big to
    buffer. Spark's exact ``percentile`` aggregate holds every value of
    a group in executor memory; this holds ``n_bins`` longs regardless
    of corpus size. Contract: the estimate lies within one bin width of
    the DISCRETE rank-ceil(q*n) value; interpolated-percentile
    definitions can differ by a full rank, which in a sparse tail is an
    unbounded value gap for ANY histogram estimator (pinned by test).

    Pass 1: min/max (order-insensitive, 2 doubles to the driver).
    Pass 2: one hash-agg onto <= n_bins integer keys, then cumulative
    counts and linear interpolation INSIDE the hit bin — all on the
    bins relation (bounded), never on the data.

    Deterministic and engine-stable: binning is floor() of exact double
    arithmetic from the collected bounds; estimates round at 6 dp.
    """
    from pyspark.sql.window import Window

    row = df.agg(
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.count(col).alias("n"),
    ).collect()[0]
    n = int(row["n"])
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [(float(q), None) for q in qs],
            "quantile double, estimate double",
        )
    mn, mx = float(row["mn"]), float(row["mx"])
    span = mx - mn
    if span <= 0:
        return spark.createDataFrame(
            [(float(q), mn) for q in qs],
            "quantile double, estimate double",
        )
    width = span / n_bins
    bin_expr = F.least(
        F.floor((F.col(col) - F.lit(mn)) / F.lit(width)).cast("long"),
        F.lit(n_bins - 1),
    )
    bins = (
        df.filter(F.col(col).isNotNull())
        .select(bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "c", F.sum("c").over(w).alias("cum")
    )  # <= n_bins rows: the single-partition window is bounded
    ests = []
    for q in qs:
        target = F.lit(float(q)) * F.lit(float(n))
        hit = (
            cum.filter(F.col("cum") >= target)
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(float(q)).alias("quantile"),
                F.round(
                    F.lit(mn)
                    + F.col("bin") * F.lit(width)
                    + (target - (F.col("cum") - F.col("c")))
                    / F.col("c")
                    * F.lit(width),
                    6,
                ).alias("estimate"),
            )
        )
        ests.append(hit)
    out = ests[0]
    for e in ests[1:]:
        out = out.unionByName(e)
    return out.orderBy("quantile")


def q_events_value_quantiles(spark, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of the event value column via the bounded-memory
    histogram estimator."""
    from bigdataminingproject_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return histogram_quantiles(ev, "value")


def grouped_histogram_quantiles(
    df: DataFrame,
    key_col: str,
    col: str,
    n_bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-key bounded-memory quantiles (p99 latency by endpoint, the
    canonical ops rollup) — the grouped version of
    ``histogram_quantiles`` with NO driver collect at all: group bounds
    join back relationally, so the operator scales to any number of
    groups (a per-group exact percentile would buffer each group's
    values; this holds n_bins counters per group).

    Zero-span groups (constant value) estimate mn at every quantile.
    Same contract as the global version: within one bin width of the
    discrete rank-ceil(q*n) value per group. All arithmetic is SQL-side
    double math from order-insensitive min/max, bit-reproducible in the
    oracle.
    """
    from pyspark.sql.window import Window

    clean = df.filter(F.col(col).isNotNull()).select(
        F.col(key_col).alias("key"), F.col(col).alias("v")
    )
    st = clean.groupBy("key").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        ((F.max("v") - F.min("v")) / F.lit(float(n_bins))).alias("w"),
    )
    binned = clean.join(F.broadcast(st), "key").select(
        "key",
        F.when(F.col("w") > 0,
               F.least(
                   F.floor((F.col("v") - F.col("mn")) / F.col("w"))
                   .cast("long"),
                   F.lit(n_bins - 1),
               ))
        .otherwise(F.lit(0))
        .alias("bin"),
    )
    bins = binned.groupBy("key", "bin").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("key")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bins.select("key", "bin", "c", F.sum("c").over(wcum).alias("cum"))
    ests = []
    for q in qs:
        hitw = Window.partitionBy("key").orderBy("bin")
        hit = (
            cum.join(F.broadcast(st), "key")
            .filter(F.col("cum") >= F.lit(float(q)) * F.col("n"))
            .withColumn("_rn", F.row_number().over(hitw))
            .filter(F.col("_rn") == 1)
            .select(
                "key",
                F.lit(float(q)).alias("quantile"),
                F.when(
                    F.col("w") > 0,
                    F.round(
                        F.col("mn")
                        + F.col("bin") * F.col("w")
                        + (
                            F.lit(float(q)) * F.col("n")
                            - (F.col("cum") - F.col("c"))
                        )
                        / F.col("c")
                        * F.col("w"),
                        6,
                    ),
                ).otherwise(F.round(F.col("mn"), 6)).alias("estimate"),
            )
        )
        ests.append(hit)
    out = ests[0]
    for e in ests[1:]:
        out = out.unionByName(e)
    return out.orderBy("key", "quantile")


def q_events_latency_by_type(spark, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of the value column per event type via the grouped
    bounded-memory histogram estimator."""
    from bigdataminingproject_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return grouped_histogram_quantiles(ev, "event_type", "value")


# ---------------------------------------------------------------------------
# Relational Count-Min inner product: join-size estimation (the
# optimizer-statistics family)
# ---------------------------------------------------------------------------

CMS_JOIN_DEPTH = 3


def cms_join_width(n_fact: int, n_dim: int) -> int:
    """COUNT-AWARE sketch width: the next power of two >=
    4 * min(|fact|, |dim|). The CMS inner-product overestimate is
    bounded in expectation by |fact|*|dim|/width per depth row
    (Cormode & Muthukrishnan '05, Thm 3), so for an FK join (true size
    ~ |fact|) this width caps expected relative error near
    |dim| * 4^-1 / min(...) ~ 25% — held CONSTANT as both sides grow,
    the same auto-sizing discipline as the LSH/IVF/ball layouts (a
    fixed width's error grows linearly with the corpus). The oracle
    derives the identical width from count(*)."""
    import math

    return 1 << int(math.ceil(math.log2(4 * max(2, min(n_fact, n_dim)))))


def cms_relation(
    df: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """Relational Count-Min sketch of a key column: ``depth`` rows of
    ``width`` counters as a (d, bucket, cnt) relation. One projection
    (explode of the tiny depth axis), one hash-aggregate whose key
    space is depth x width REGARDLESS of corpus size — the map-side-
    combinable shape that lets a 100 TB fact table compress to a
    fixed-size summary in a single scan. Buckets are md5-derived
    (layout/retry-invariant; the oracle replays them)."""
    d = F.explode(lit_array(list(range(depth)))).alias("d")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("k"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )
    return (
        df.select(F.col(key_col).cast("string").alias("k"))
        .select(d, "k")
        .select("d", bucket.alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_join_size(
    spark,
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    depth: int = CMS_JOIN_DEPTH,
) -> DataFrame:
    """Equi-join size estimation WITHOUT performing the join — the
    AGMS/CMS inner-product estimator every cost-based optimizer needs:
    |fact JOIN dim| = sum_k f_fact(k) * f_dim(k), estimated as the
    minimum over depth rows of the bucket-wise counter inner product.
    Work: one scan per side into a depth x width aggregate, then a
    (depth x width)-sized equi-join — the estimate's cost is
    INDEPENDENT of the join it prices, which is the entire point at
    100 TB (AQE-style planning reads the sketch, not the data).

    The output also carries the exact size (computed from the two
    key-frequency relations — key-cardinality work, still never the
    join itself) and the overestimate percentage, so the estimator's
    error is part of the checked surface rather than a claim. CMS
    estimates never underestimate (counters only over-count under
    collisions) — pinned in tests."""
    n_f = fact.count()
    n_d = dim.count()
    width = cms_join_width(n_f, n_d)
    sk_f = cms_relation(fact, fact_key, depth, width)
    sk_d = cms_relation(dim, dim_key, depth, width).withColumnRenamed(
        "cnt", "cnt_d"
    )
    per_depth = (
        sk_f.join(sk_d, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt_d")).alias("ip"))
    )
    est = per_depth.agg(F.min("ip").alias("est_rows"))
    ff = fact.groupBy(F.col(fact_key).alias("k")).agg(
        F.count(F.lit(1)).alias("cf")
    )
    fd = dim.groupBy(F.col(dim_key).alias("k")).agg(
        F.count(F.lit(1)).alias("cd")
    )
    exact = ff.join(fd, "k").agg(
        F.sum(F.col("cf") * F.col("cd")).alias("exact_rows")
    )
    return (
        est.crossJoin(exact)
        .select(
            "est_rows",
            "exact_rows",
            F.round(
                (F.col("est_rows") - F.col("exact_rows"))
                * 100.0
                / F.col("exact_rows"),
                2,
            ).alias("overestimate_pct"),
        )
    )


SAMPLE_JOIN_BITS = 6  # keep keys whose 48-bit hash ≡ 0 mod 2^6 (p = 1/64)


def sampled_join_size(
    spark,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    bits: int = SAMPLE_JOIN_BITS,
) -> DataFrame:
    """Correlated-sampling join-size estimate (Estan & Naughton,
    ICDE '06 end-biased lineage): sample KEYS, not rows — both sides
    keep exactly the keys whose shared hash lands in a 1/2^bits
    bucket, so every surviving key contributes its FULL a_k·b_k pair
    count and E[sampled size]/p is unbiased for Σ a_k·b_k. Row-wise
    independent sampling would need 1/p² correction and huge variance;
    key-synchronized sampling is the estimator that actually works
    for joins.

    The alternative statistic to the CMS inner product
    (``cms_join_size``): CMS never misses but overestimates by hash
    collisions; correlated sampling is unbiased but can miss rare
    heavy keys. Reporting both against the same truth lets a cost
    model pick. Deterministic: the sample is a pure function of the
    48-bit md5 idiom, so the DuckDB oracle replays it bit-for-bit.

    Scale shape: the hash predicate filters MAP-SIDE on each scan
    (whole-stage codegen, no shuffle to sample), the sampled join
    moves ~p of each side, and the exact leg is the attestation
    envelope (same posture as the CMS estimator's exact column).
    """
    keyhash = lambda c: F.conv(  # noqa: E731 — the pinned 48-bit idiom
        F.substring(F.md5(F.col(c).cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    mod = 2**bits
    ls = left.filter(keyhash(left_key) % mod == 0).select(
        F.col(left_key).alias("k")
    )
    rs = right.filter(keyhash(right_key) % mod == 0).select(
        F.col(right_key).alias("k")
    )
    sampled = ls.join(rs, "k").agg(
        F.count(F.lit(1)).alias("sampled_pairs")
    )
    exact = (
        left.select(F.col(left_key).alias("k"))
        .join(right.select(F.col(right_key).alias("k")), "k")
        .agg(F.count(F.lit(1)).alias("exact_pairs"))
    )
    return (
        sampled.crossJoin(exact)  # two 1-row aggregates
        .select(
            F.col("sampled_pairs").cast("bigint").alias("sampled_pairs"),
            (F.col("sampled_pairs") * F.lit(mod))
            .cast("bigint")
            .alias("est_pairs"),
            F.col("exact_pairs").cast("bigint").alias("exact_pairs"),
            F.when(F.col("exact_pairs") == 0, F.lit(0.0))
            .otherwise(
                F.floor(
                    F.abs(
                        F.col("sampled_pairs") * F.lit(mod)
                        - F.col("exact_pairs")
                    ).cast("double")
                    * 10000.0
                    / F.col("exact_pairs").cast("double")
                    + 0.5
                )
                / 100.0
            )
            .alias("err_pct"),
        )
    )


def q_join_size_sampled(spark, sf_dir: str) -> DataFrame:
    """Correlated-sampling estimate of |orders JOIN customer| next to
    the exact size — the unbiased sibling of the CMS estimator on the
    same join."""
    from bigdataminingproject_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return sampled_join_size(
        spark, orders, cust, "o_custkey", "c_custkey"
    )


def sampled_join_oracle_sql(bits: int = SAMPLE_JOIN_BITS) -> str:
    """DuckDB mirror of ``q_join_size_sampled`` — the identical
    48-bit md5 key-bucket predicate and the same pinned err quotient."""
    mod = 2**bits
    pred = (
        "CAST('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 12) "
        "AS BIGINT) % {m} = 0"
    )
    lp = pred.format(k="o_custkey", m=mod)
    rp = pred.format(k="c_custkey", m=mod)
    return f"""
WITH s AS (
    SELECT CAST(count(*) AS BIGINT) AS sampled_pairs
    FROM (SELECT o_custkey AS k FROM orders WHERE {lp}) l
    JOIN (SELECT c_custkey AS k FROM customer WHERE {rp}) r
      USING (k)
),
e AS (
    SELECT CAST(count(*) AS BIGINT) AS exact_pairs
    FROM (SELECT o_custkey AS k FROM orders) l
    JOIN (SELECT c_custkey AS k FROM customer) r USING (k)
)
SELECT sampled_pairs,
       CAST(sampled_pairs * {mod} AS BIGINT) AS est_pairs,
       exact_pairs,
       CASE WHEN exact_pairs = 0 THEN 0.0
            ELSE floor(CAST(abs(sampled_pairs * {mod} - exact_pairs)
                            AS DOUBLE) * 10000.0
                       / CAST(exact_pairs AS DOUBLE) + 0.5) / 100.0
       END AS err_pct
FROM s, e"""


def q_join_size_estimate(spark, sf_dir: str) -> DataFrame:
    """CMS inner-product estimate of |orders JOIN customer| vs the
    exact frequency-vector inner product, with the overestimate
    percentage as a checked output column."""
    from bigdataminingproject_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return cms_join_size(spark, orders, cust, "o_custkey", "c_custkey")


# The streaming twin stores CMS counters at this fixed maximum bucket
# precision; any count-derived power-of-two width <= 2^MAX divides it,
# so masking down (sum counters over bucket % width) reproduces the
# direct width-W sketch exactly — the count-invariant-state pattern.
# 24 bits covers min-side key cardinalities up to 2^24/4 ≈ 4.2M (the
# round-7 100x probe needed 2^23 and tripped the 2^20 guard — the cap
# is loud, never silent); the stored relation is OCCUPIED buckets
# only, so raising the cap costs nothing at small scale.
CMS_JOIN_MAX_BITS = 24
