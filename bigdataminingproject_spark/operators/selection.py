"""Exact distributed order statistics (selection) without a global sort.

The existing quantile surface is approximate-first (histogram
estimator, q-digest) or relies on Spark's exact ``percentile``
aggregate, which buffers one counter per distinct value per group —
fine on low-NDV money columns, an OOM on a high-NDV double column at
corpus scale. ``orderBy().limit(k)`` ships k rows to one task, which
dies when k sits in the middle of 100 TB.

This module is the classic iterative SELECTION algorithm instead
(Blum et al. selection generalized to partitioned data; the
Munro-Paterson / distributed-median shape): find the exact k-th
smallest with

  pass 0   count + per-target [min, max] bracket (one aggregate)
  pass i   ONE scan — the source broadcast-range-joined against the
           tiny (target, lo, hi) bracket table — bins every active
           target's bracket into ``bins`` equal-width cells
           ((target, cell) -> measure, count, min, max); the driver
           keeps only the cell containing the rank: bracket mass
           shrinks by ~``bins``x per pass, driver state is
           O(targets x 4) floats, never rows
  final    the narrowed bracket holds <= ``bound`` rows; the (k -
           before)-th smallest inside it is a bounded
           TakeOrderedAndProject

Depth is log_bins(N / bound): 3 passes covers 10^13 rows at the
defaults. Every pass is a full scan (no index), which is the honest
cost of EXACT mid-stream order statistics on unsorted data; callers
who can tolerate rank error should stay on the q-digest
(`operators/qdigest.py`).

All three public variants — plain, keyed, and integer-weighted —
share one descent (`_descent`): the key is a constant for the plain
path, and the weighted path swaps the cell measure from count to
sum(weight) and the crossing target from a rank to q x W.

Exactness does not depend on float niceties: binning only PARTITIONS
rows (floor((v - lo)/(hi - lo) * bins) is monotone in v, so cells are
contiguous value ranges), counts/integer weights are exact, and the
refined bracket's bounds are the actual min/max of the chosen cell's
rows — measured, not computed — so no row can leak across a boundary.

No reference counterpart (the reference has no quantile surface at
all); north-star scale family alongside qdigest.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.functions.numeric import (
    stable_avg,
    stable_round_div,
)
from bigdataminingproject_spark.sources.tables import load_table

SEL_BINS = 1024
SEL_BOUND = 50_000  # narrow-pass row budget (driver-safe final sort)
SEL_MAX_DEPTH = 6  # loud-guard cap: 1024^6 >> any corpus
SEL_MAX_KEYS = 64  # grouped selection collects one state row per key


def _guard_key_cardinality(vals: DataFrame) -> None:
    """Refuse unbounded key columns BEFORE any per-key state reaches
    the driver: a distinct().limit(SEL_MAX_KEYS + 1).count() stops
    scanning at the cap + 1 instead of collecting an arbitrary-size
    groupBy first (the driver-memory hazard the guard exists for)."""
    seen = vals.select("k").distinct().limit(SEL_MAX_KEYS + 1).count()
    if seen > SEL_MAX_KEYS:
        raise ValueError(
            f"grouped selection saw >{SEL_MAX_KEYS} keys; use "
            "grouped_histogram_quantiles for unbounded key sets"
        )


def _rank_of(q: float, n: int) -> int:
    """DuckDB quantile_disc's inverse-CDF rank, pinned in IEEE doubles
    on BOTH sides (the oracle computes ceil(CAST(q AS DOUBLE) * n) the
    same way, so even q*n landing a hair above an integer — 0.01*1000
    = 10.000000000000002 — diverges on neither)."""
    return max(1, int(math.ceil(q * float(n))))


def _descent(
    vals: DataFrame,
    state: dict,
    key_type: str,
    bins: int,
    bound: int,
    weighted: bool = False,
) -> None:
    """Shared bracket-descent loop over ``vals(k, v[, wt])``.

    ``state`` maps (key, q) -> {lo, hi, before, mass, target}; the
    crossing rule is: first cell (in value order) where
    before + cumulative measure >= target, measure = count (rank
    targets) or sum(wt) (weight targets). Mutates ``state`` in place;
    raises loudly if any bracket still exceeds ``bound`` rows after
    ``SEL_MAX_DEPTH`` passes.

    Each pass is ONE scan of ``vals``: the active brackets travel as a
    broadcast (key, q, lo, hi) relation and the range join tags every
    row with each of its key's active targets (a row serves every
    bracket it falls in), so target count multiplies only the
    broadcast, never the source I/O.
    """
    spark = vals.sparkSession
    for _ in range(SEL_MAX_DEPTH):
        active = {
            t: s
            for t, s in state.items()
            if s["mass"] > bound and s["lo"] < s["hi"]
        }
        if not active:
            break
        brackets = spark.createDataFrame(
            [
                (key, float(q), s["lo"], s["hi"])
                for (key, q), s in active.items()
            ],
            f"gk {key_type}, q double, blo double, bhi double",
        )
        # same op order as the literal form: ((v - lo) / (hi - lo)) * bins
        cell = F.least(
            F.lit(bins - 1),
            F.floor(
                (F.col("v") - F.col("blo"))
                / (F.col("bhi") - F.col("blo"))
                * bins
            ),
        ).cast("int")
        measure = F.sum("wt") if weighted else F.count(F.lit(1))
        cells = (
            vals.join(
                F.broadcast(brackets),
                (vals["k"] == F.col("gk"))
                & (F.col("v") >= F.col("blo"))
                & (F.col("v") <= F.col("bhi")),
            )
            .groupBy("gk", "q", cell.alias("cell"))
            .agg(
                measure.alias("m"),
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("clo"),
                F.max("v").alias("chi"),
            )
            .collect()
        )  # bounded: <= targets x bins rows
        by_t: dict[tuple, list] = {}
        for r in cells:
            by_t.setdefault((r["gk"], r["q"]), []).append(r)
        for (key, q), s in active.items():
            rows = sorted(
                by_t.get((key, float(q)), []), key=lambda r: r["cell"]
            )
            cum = 0
            for r in rows:
                # crossing rule bit-identical to _finish and the oracle
                # (before + cum >= target): a float subtraction
                # (target - before) could disagree by one ulp when a
                # weighted cumulative lands exactly on the target
                if s["before"] + cum + r["m"] >= s["target"]:
                    s["before"] += cum
                    s["mass"] = r["c"]
                    # measured bounds of the chosen cell: rows cannot
                    # leak across them whatever float binning did
                    s["lo"], s["hi"] = r["clo"], r["chi"]
                    break
                cum += r["m"]
            else:  # pragma: no cover - measures are exact
                raise AssertionError(
                    f"target fell out of bracket for {(key, q)}"
                )
    leftover = [
        t
        for t, s in state.items()
        if s["mass"] > bound and s["lo"] < s["hi"]
    ]
    if leftover:  # pragma: no cover - 1024^6 cells
        raise ValueError(
            f"selection bracket still holds >{bound} rows after "
            f"{SEL_MAX_DEPTH} passes for {sorted(leftover)}; raise "
            "SEL_MAX_DEPTH alongside the corpus"
        )


def _finish(
    vals: DataFrame,
    state: dict,
    key_type: str,
    weighted: bool = False,
) -> dict:
    """ONE batched final narrow pass for EVERY target (not one tiny
    job per target — 40 sequential driver round-trips dominated the
    grouped-weighted 100x wall before this): the (target, bracket,
    before, target-measure) table travels as a broadcast, candidate
    rows (<= targets x bound) group by (target, value), and a small
    per-target window finds the crossing value — the smallest v whose
    cumulative measure reaches the target. Returns {(key, q): value}.

    The crossing rule serves both modes: for rank targets the measure
    is the row count (value at rank need = smallest v with
    count(<= v) >= target - before); for weight targets it is
    sum(wt). Collapsed brackets (lo == hi) skip the scan entirely.
    """
    spark = vals.sparkSession
    out: dict = {}
    todo = []
    for (key, q), s in state.items():
        if s["lo"] == s["hi"]:  # bracket collapsed to one value
            out[(key, q)] = float(s["lo"])
        else:
            todo.append(
                (key, float(q), s["lo"], s["hi"], int(s["before"]),
                 float(s["target"]) if weighted else int(s["target"]))
            )
    if not todo:
        return out
    ttype = "double" if weighted else "bigint"
    brackets = spark.createDataFrame(
        todo,
        f"gk {key_type}, q double, blo double, bhi double, "
        f"before bigint, target {ttype}",
    )
    measure = F.sum("wt") if weighted else F.count(F.lit(1))
    cand = (
        vals.join(
            F.broadcast(brackets),
            (vals["k"] == F.col("gk"))
            & (F.col("v") >= F.col("blo"))
            & (F.col("v") <= F.col("bhi")),
        )
        .groupBy("gk", "q", "before", "target", "v")
        .agg(measure.alias("m"))
    )
    win = Window.partitionBy("gk", "q").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    crossed = (
        cand.withColumn("cum", F.sum("m").over(win))
        .filter(F.col("cum") + F.col("before") >= F.col("target"))
        .groupBy("gk", "q")
        .agg(F.min("v").alias("value"))
    )
    for r in crossed.collect():
        out[(r["gk"], r["q"])] = float(r["value"])
    return out


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99),
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
    stats: tuple[int, float, float] | None = None,
) -> DataFrame:
    """Exact (q, rank, value) order statistics of ``df[col]`` via
    bracket descent. Returns one row per q, ordered by q.

    ``stats`` — optional precomputed ``(n, min, max)`` of the NON-NULL
    double population of ``df[col]``; callers that already aggregated
    the column (histogram build, AQP samplers) pass it to skip the
    redundant bounds scan. Wrong stats give wrong answers — the
    contract is the caller aggregated the identical population."""
    spark = df.sparkSession
    # each pass re-reads the source with its filter pushed to the scan
    # (deliberately NOT cached/checkpointed: at corpus scale the input
    # does not fit executor storage, and a 2-column pruned parquet
    # re-scan is the cheaper, honest cost of exactness)
    vals = df.select(
        F.lit(0).alias("k"), F.col(col).cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    out_schema = "q double, rank bigint, value double"
    if stats is None:
        g = vals.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        ).collect()[0]
        stats = (g["n"], g["lo"], g["hi"])
    s_n, s_lo, s_hi = stats
    if s_n == 0:
        return spark.createDataFrame([], out_schema)
    state = {
        (0, q): {
            "lo": s_lo,
            "hi": s_hi,
            "before": 0,
            "mass": s_n,
            "target": _rank_of(q, s_n),
        }
        for q in qs
    }
    _descent(vals, state, "int", bins, bound)
    values = _finish(vals, state, "int")
    out_rows = [
        (float(q), s["target"], values[(0, q)])
        for (_, q), s in sorted(state.items())
    ]
    return spark.createDataFrame(out_rows, out_schema).orderBy("q")


def exact_ranks(
    df: DataFrame,
    col: str,
    ranks: tuple[int, ...],
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
    stats: tuple[int, float, float] | None = None,
) -> dict[int, float]:
    """Exact values at explicit 1-based RANKS of ``df[col]`` (the raw
    selection primitive under exact_quantiles, exposed for callers —
    like the AQP quantile estimator's binomial rank bounds — whose
    targets are ranks, not quantile fractions). All ranks advance in
    one shared descent; returns {rank: value} (ranks clamped to
    [1, n]); empty dict on an empty column. ``stats`` as in
    :func:`exact_quantiles` — precomputed (n, min, max) of the
    non-null population, skips the bounds scan."""
    g = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    vals = g.select(F.lit(0).alias("k"), "v")
    if stats is None:
        s = vals.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        ).collect()[0]
        stats = (s["n"], s["lo"], s["hi"])
    s_n, s_lo, s_hi = stats
    if s_n == 0:
        return {}
    clamped = sorted({max(1, min(int(s_n), int(r))) for r in ranks})
    state = {
        (0, float(r)): {
            "lo": s_lo,
            "hi": s_hi,
            "before": 0,
            "mass": s_n,
            "target": int(r),
        }
        for r in clamped
    }
    _descent(vals, state, "int", bins, bound)
    values = _finish(vals, state, "int")
    return {int(r): values[(0, float(r))] for r in clamped}


def grouped_exact_quantiles(
    df: DataFrame,
    key_col: str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
) -> DataFrame:
    """Per-key EXACT order statistics by the same bracket descent, all
    keys advancing in the same scans (targets = keys x qs; driver state
    is O(keys x qs) floats).

    Keyed selection needs one driver state row per key, so the key set
    must be bounded (status/type/tier columns — the guard refuses past
    ``SEL_MAX_KEYS``); for unbounded keys the bounded-memory grouped
    histogram (`sketches.grouped_histogram_quantiles`) is the
    approximate path that never touches the driver.
    """
    spark = df.sparkSession
    key_type = df.schema[key_col].dataType.simpleString()
    vals = df.select(
        F.col(key_col).alias("k"),
        F.col(col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("k").isNotNull())
    out_schema = f"{key_col} {key_type}, q double, rank bigint, value double"
    _guard_key_cardinality(vals)
    groups = (
        vals.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    )
    if not groups:
        return spark.createDataFrame([], out_schema)
    state = {
        (g["k"], q): {
            "lo": g["lo"],
            "hi": g["hi"],
            "before": 0,
            "mass": g["n"],
            "target": _rank_of(q, g["n"]),
        }
        for g in groups
        for q in qs
    }
    _descent(vals, state, key_type, bins, bound)
    values = _finish(vals, state, key_type)
    out_rows = [
        (key, float(q), s["target"], values[(key, q)])
        for (key, q), s in sorted(state.items())
    ]
    return spark.createDataFrame(out_rows, out_schema).orderBy(
        key_col, "q"
    )


def weighted_exact_quantiles(
    df: DataFrame,
    col: str,
    weight_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
) -> DataFrame:
    """Exact WEIGHTED order statistics: for each q, the smallest value
    v with cumulative weight(rows ≤ v) >= q x total_weight — the
    byte-budget median family ("the doc length below which half the
    BYTES live"), which no unweighted quantile answers.

    Same descent, with the cell measure sum(weight) instead of count
    (row count still bounds the narrow pass). Weights must be INTEGERS
    (cast to long): integer sums are associative, so the crossing
    point is independent of partitioning — a double weight column
    would make cumulative sums order-dependent and the oracle
    comparison a lie. The crossing threshold q x W is one double
    computed from the same (q, W) on both engines.
    """
    spark = df.sparkSession
    vals = (
        df.select(
            F.lit(0).alias("k"),
            F.col(col).cast("double").alias("v"),
            F.col(weight_col).cast("long").alias("wt"),
        )
        .filter(F.col("v").isNotNull() & F.col("wt").isNotNull())
        .filter(F.col("wt") > 0)
    )
    out_schema = "q double, value double"
    g = vals.agg(
        F.sum("wt").alias("w"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    if g["w"] is None or g["w"] == 0:
        return spark.createDataFrame([], out_schema)
    total_w = int(g["w"])
    state = {
        (0, q): {
            "lo": g["lo"],
            "hi": g["hi"],
            "before": 0,
            "mass": g["n"],
            # crossed AT the answer value: smallest v with
            # before + cum_w(v) >= target
            "target": float(q) * float(total_w),
        }
        for q in qs
    }
    _descent(vals, state, "int", bins, bound, weighted=True)
    values = _finish(vals, state, "int", weighted=True)
    out_rows = [
        (float(q), values[(0, q)]) for (_, q), _s in sorted(state.items())
    ]
    return spark.createDataFrame(out_rows, out_schema).orderBy("q")


def grouped_weighted_exact_quantiles(
    df: DataFrame,
    key_col: str,
    col: str,
    weight_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
) -> DataFrame:
    """Per-key exact WEIGHTED order statistics — the fourth cell of
    the selection matrix (plain/keyed x unweighted/weighted), all on
    the shared descent: every (key, q) target advances in the same
    scans with sum(weight) as the cell measure and q x W(key) as the
    crossing target. Integer weights required, same associativity
    argument as the global weighted variant; ``SEL_MAX_KEYS`` guard as
    the keyed one."""
    spark = df.sparkSession
    key_type = df.schema[key_col].dataType.simpleString()
    vals = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(col).cast("double").alias("v"),
            F.col(weight_col).cast("long").alias("wt"),
        )
        .filter(
            F.col("v").isNotNull()
            & F.col("k").isNotNull()
            & F.col("wt").isNotNull()
        )
        .filter(F.col("wt") > 0)
    )
    out_schema = f"{key_col} {key_type}, q double, value double"
    _guard_key_cardinality(vals)
    groups = (
        vals.groupBy("k")
        .agg(
            F.sum("wt").alias("w"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    )
    if not groups:
        return spark.createDataFrame([], out_schema)
    state = {
        (g["k"], q): {
            "lo": g["lo"],
            "hi": g["hi"],
            "before": 0,
            "mass": g["n"],
            "target": float(q) * float(int(g["w"])),
        }
        for g in groups
        for q in qs
    }
    _descent(vals, state, key_type, bins, bound, weighted=True)
    values = _finish(vals, state, key_type, weighted=True)
    out_rows = [
        (key, float(q), values[(key, q)])
        for (key, q), _s in sorted(state.items())
    ]
    return spark.createDataFrame(out_rows, out_schema).orderBy(
        key_col, "q"
    )


def mad_outliers(
    df: DataFrame,
    col: str,
    group_col: str,
    k: float = 3.0,
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
) -> DataFrame:
    """Robust outlier rates per group under the median/MAD rule — the
    data-cleaning screen that, unlike mean/stddev z-scores, outliers
    themselves cannot corrupt (50% breakdown point).

    Composes the exact-selection operator twice: m = exact median of
    ``col``; MAD = exact median of |col - m| (a derived column — the
    descent never materializes it, each pass recomputes the abs-dev
    inside the scan); flag rows with |v - m| > k x MAD. Both medians
    are EXACT order statistics of the full corpus, so m, MAD, and the
    threshold are single doubles both engines derive identically —
    the flag comparison is then bitwise-reproducible. NULL group keys
    are excluded (same rule as the keyed-selection sibling and the
    oracle).
    """
    spark = df.sparkSession
    key_type = df.schema[group_col].dataType.simpleString()
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col(group_col).isNotNull())
    out_schema = (
        f"{group_col} {key_type}, n_events bigint, n_outliers bigint, "
        "outlier_rate double"
    )
    med_rows = exact_quantiles(
        vals, "v", qs=(0.5,), bins=bins, bound=bound
    ).collect()
    if not med_rows:
        return spark.createDataFrame([], out_schema)
    m = med_rows[0]["value"]
    dev = vals.select("g", F.abs(F.col("v") - F.lit(m)).alias("d"))
    mad = exact_quantiles(dev, "d", qs=(0.5,), bins=bins, bound=bound).collect()[
        0
    ]["value"]
    thr = k * mad
    return (
        vals.select(
            "g",
            (F.abs(F.col("v") - F.lit(m)) > F.lit(thr))
            .cast("long")
            .alias("is_out"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_out").alias("n_outliers"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_events",
            "n_outliers",
            stable_round_div(
                F.col("n_outliers"), F.col("n_events"), 6
            ).alias("outlier_rate"),
        )
        .orderBy(group_col)
    )


def winsorized_stats(
    df: DataFrame,
    col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
) -> DataFrame:
    """Per-group winsorized statistics: clip ``col`` to the group's
    EXACT [p_lo, p_hi] order statistics, then aggregate — the robust
    mean that tail corruption cannot drag (the data-cleaning sibling
    of mad_outliers, clipping instead of flagging).

    Composes the keyed descent once for both clip bounds (every
    (group, p) target advances in the same scans), broadcasts the
    bounded (group, lo, hi) clip table back, and finishes with one
    hash-agg over clipped values. The clip bounds are exact selected
    VALUES — identical doubles on both engines — so clipping is a
    pure per-row function and the winsorized mean inherits the
    stable_avg discipline (2-dp inner sum on 2-dp clipped values).
    Returns (group, n_events, n_lo_clipped, n_hi_clipped, p_lo_value,
    p_hi_value, win_mean).
    """
    spark = df.sparkSession
    key_type = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {key_type}, n_events bigint, n_lo_clipped bigint, "
        "n_hi_clipped bigint, p_lo_value double, p_hi_value double, "
        "win_mean double"
    )
    qdf = grouped_exact_quantiles(
        df, group_col, col, qs=(p_lo, p_hi), bins=bins, bound=bound
    ).collect()  # bounded: keys x 2 (the descent's own guard applies)
    if not qdf:
        return spark.createDataFrame([], out_schema)
    clip: dict = {}
    for r in qdf:
        lohi = clip.setdefault(r[group_col], {})
        lohi[float(r["q"])] = float(r["value"])
    clip_df = F.broadcast(
        spark.createDataFrame(
            [(k, v[p_lo], v[p_hi]) for k, v in clip.items()],
            f"g {key_type}, qlo double, qhi double",
        )
    )
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col(group_col).isNotNull())
    w = F.least(F.greatest(F.col("v"), F.col("qlo")), F.col("qhi"))
    return (
        vals.join(clip_df, "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("v") < F.col("qlo")).cast("long")).alias(
                "n_lo_clipped"
            ),
            F.sum((F.col("v") > F.col("qhi")).cast("long")).alias(
                "n_hi_clipped"
            ),
            F.min("qlo").alias("p_lo_value"),
            F.max("qhi").alias("p_hi_value"),
            stable_avg(w, 4, 2).alias("win_mean"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_events",
            "n_lo_clipped",
            "n_hi_clipped",
            "p_lo_value",
            "p_hi_value",
            "win_mean",
        )
        .orderBy(group_col)
    )


def q_events_winsorized_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type winsorized value statistics (clip at the exact
    per-type [p5, p95], count what the clip touched, robust mean)."""
    ev = load_table(spark, sf_dir, "events")
    return winsorized_stats(ev, "value", "event_type")


def q_events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p1/p25/p50/p75/p90/p99 of the event value column via
    distributed selection (no global sort, no per-value counters)."""
    ev = load_table(spark, sf_dir, "events")
    return exact_quantiles(ev, "value")


def q_events_grouped_exact_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact per-event-type p50/p90/p99 of the value column via keyed
    bracket descent (every event type advances in the same scans)."""
    ev = load_table(spark, sf_dir, "events")
    return grouped_exact_quantiles(ev, "event_type", "value")


def q_doc_weighted_length_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Byte-budget length quantiles: the doc length below which q of
    the corpus BYTES live (n_chars-weighted n_chars order statistics)
    — the statistic sequence-packing budgets actually need."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_exact_quantiles(docs, "n_chars", "n_chars")


def q_doc_source_weighted_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source byte-budget length quantiles: for each source, the
    doc length below which half / 90% of THAT source's bytes live —
    the per-domain packing statistic mixture planning needs."""
    docs = load_table(spark, sf_dir, "documents")
    return grouped_weighted_exact_quantiles(
        docs, "source", "n_chars", "n_chars"
    )


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier rates of the value column under
    the corpus-wide median/MAD screen (3 x MAD rule)."""
    ev = load_table(spark, sf_dir, "events")
    return mad_outliers(ev, "value", "event_type")
