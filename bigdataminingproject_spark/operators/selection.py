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

  pass 0   count + global [min, max] bracket
  pass i   ONE scan bins every still-active target's bracket into
           ``bins`` equal-width cells — (target, cell) -> (count,
           min, max) — and the driver keeps only the cell containing
           the rank: bracket mass shrinks by ~``bins``x per pass,
           driver state is O(targets x 3) floats, never rows
  final    the narrowed bracket holds <= ``bound`` rows; the (k -
           rows_before)-th smallest inside it is a bounded
           TakeOrderedAndProject

Depth is log_bins(N / bound): 3 passes covers 10^13 rows at the
defaults. Every pass is a full scan (no index), which is the honest
cost of EXACT mid-stream order statistics on unsorted data; callers
who can tolerate rank error should stay on the q-digest
(`operators/qdigest.py`).

Exactness does not depend on float niceties: binning only PARTITIONS
rows (floor((v - lo)/w * bins) is monotone in v for w > 0, so cells
are contiguous value ranges), counts are integers, and the refined
bracket's bounds are the actual min/max of the chosen cell's rows —
measured, not computed — so no row can leak across a boundary.

No reference counterpart (the reference has no quantile surface at
all); north-star scale family alongside qdigest.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.functions.numeric import stable_round_div

from bigdataminingproject_spark.sources.tables import load_table

SEL_BINS = 1024
SEL_BOUND = 50_000  # narrow-pass row budget (driver-safe final sort)
SEL_MAX_DEPTH = 6  # loud-guard cap: 1024^6 >> any corpus


def _rank_of(q: float, n: int) -> int:
    """DuckDB quantile_disc's inverse-CDF rank, pinned in IEEE doubles
    on BOTH sides (the oracle computes ceil(CAST(q AS DOUBLE) * n) the
    same way, so even q*n landing a hair above an integer — 0.01*1000
    = 10.000000000000002 — diverges on neither)."""
    return max(1, int(math.ceil(q * float(n))))


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99),
    bins: int = SEL_BINS,
    bound: int = SEL_BOUND,
) -> DataFrame:
    """Exact (q, rank, value) order statistics of ``df[col]`` via
    iterative bracket descent. Returns one row per q, ordered by q."""
    spark = df.sparkSession
    # each pass re-reads the source with its filter pushed to the scan
    # (deliberately NOT cached/checkpointed: at corpus scale the input
    # does not fit executor storage, and a 2-column pruned parquet
    # re-scan is the cheaper, honest cost of exactness)
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    out_schema = "q double, rank bigint, value double"
    n = vals.count()
    if n == 0:
        return spark.createDataFrame([], out_schema)
    g = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    # per-target state: value bracket [lo, hi], rows strictly below it,
    # rows inside it
    state = {
        q: {"lo": g["lo"], "hi": g["hi"], "before": 0, "mass": n, "k": _rank_of(q, n)}
        for q in qs
    }

    for _ in range(SEL_MAX_DEPTH):
        active = {
            q: s
            for q, s in state.items()
            if s["mass"] > bound and s["lo"] < s["hi"]
        }
        if not active:
            break
        # ONE scan refines every active bracket: tag rows per target
        # (brackets may overlap; a row serves each bracket it is in),
        # bin equal-width, and measure each cell.
        tagged = None
        for q, s in active.items():
            w = s["hi"] - s["lo"]
            cell = F.least(
                F.lit(bins - 1),
                F.floor((F.col("v") - F.lit(s["lo"])) / F.lit(w) * bins),
            ).cast("int")
            part = (
                vals.filter(
                    (F.col("v") >= s["lo"]) & (F.col("v") <= s["hi"])
                )
                .select(
                    F.lit(float(q)).alias("q"),
                    cell.alias("cell"),
                    "v",
                )
            )
            tagged = part if tagged is None else tagged.unionByName(part)
        cells = (
            tagged.groupBy("q", "cell")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("clo"),
                F.max("v").alias("chi"),
            )
            .collect()
        )  # bounded: <= targets x bins rows
        by_q: dict[float, list] = {}
        for r in cells:
            by_q.setdefault(r["q"], []).append(r)
        for q, s in active.items():
            rows = sorted(by_q.get(float(q), []), key=lambda r: r["cell"])
            need = s["k"] - s["before"]  # rank within the bracket
            cum = 0
            for r in rows:
                if cum + r["c"] >= need:
                    s["before"] += cum
                    s["mass"] = r["c"]
                    # measured bounds of the chosen cell: rows cannot
                    # leak across them whatever float binning did
                    s["lo"], s["hi"] = r["clo"], r["chi"]
                    break
                cum += r["c"]
            else:  # pragma: no cover - counts are exact by construction
                raise AssertionError(f"rank {s['k']} fell out of bracket for q={q}")
    leftover = {
        q: s for q, s in state.items() if s["mass"] > bound and s["lo"] < s["hi"]
    }
    if leftover:  # pragma: no cover - 1024^6 cells
        raise ValueError(
            f"selection bracket still holds >{bound} rows after "
            f"{SEL_MAX_DEPTH} passes for q={sorted(leftover)}; raise "
            "SEL_MAX_DEPTH alongside the corpus"
        )

    # final narrow pass per target: (k - before)-th smallest inside the
    # bracket — a bounded TakeOrderedAndProject, never a global sort.
    out_rows = []
    for q, s in sorted(state.items()):
        if s["lo"] == s["hi"]:  # bracket collapsed to one value
            out_rows.append((float(q), s["k"], float(s["lo"])))
            continue
        need = s["k"] - s["before"]
        got = (
            vals.filter((F.col("v") >= s["lo"]) & (F.col("v") <= s["hi"]))
            .orderBy("v")
            .limit(need)
            .agg(F.max("v").alias("value"))
            .collect()[0]["value"]
        )
        out_rows.append((float(q), s["k"], float(got)))
    return spark.createDataFrame(out_rows, out_schema).orderBy("q")


def q_events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p1/p25/p50/p75/p90/p99 of the event value column via
    distributed selection (no global sort, no per-value counters)."""
    ev = load_table(spark, sf_dir, "events")
    return exact_quantiles(ev, "value")


SEL_MAX_KEYS = 64  # grouped selection collects one state row per key


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
    vals = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull() & F.col("k").isNotNull())
    )
    out_schema = (
        f"{key_col} string, q double, rank bigint, value double"
    )
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
    if len(groups) > SEL_MAX_KEYS:
        raise ValueError(
            f"grouped selection saw {len(groups)} keys (> "
            f"{SEL_MAX_KEYS}); use grouped_histogram_quantiles for "
            "unbounded key sets"
        )
    state = {
        (g["k"], q): {
            "lo": g["lo"],
            "hi": g["hi"],
            "before": 0,
            "mass": g["n"],
            "k": _rank_of(q, g["n"]),
        }
        for g in groups
        for q in qs
    }

    for _ in range(SEL_MAX_DEPTH):
        active = {
            t: s
            for t, s in state.items()
            if s["mass"] > bound and s["lo"] < s["hi"]
        }
        if not active:
            break
        tagged = None
        for (key, q), s in active.items():
            w = s["hi"] - s["lo"]
            cell = F.least(
                F.lit(bins - 1),
                F.floor((F.col("v") - F.lit(s["lo"])) / F.lit(w) * bins),
            ).cast("int")
            part = (
                vals.filter(
                    (F.col("k") == key)
                    & (F.col("v") >= s["lo"])
                    & (F.col("v") <= s["hi"])
                )
                .select(
                    F.lit(key).alias("gk"),
                    F.lit(float(q)).alias("q"),
                    cell.alias("cell"),
                    "v",
                )
            )
            tagged = part if tagged is None else tagged.unionByName(part)
        cells = (
            tagged.groupBy("gk", "q", "cell")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("clo"),
                F.max("v").alias("chi"),
            )
            .collect()
        )
        by_t: dict[tuple, list] = {}
        for r in cells:
            by_t.setdefault((r["gk"], r["q"]), []).append(r)
        for t, s in active.items():
            rows = sorted(by_t.get((t[0], float(t[1])), []), key=lambda r: r["cell"])
            need = s["k"] - s["before"]
            cum = 0
            for r in rows:
                if cum + r["c"] >= need:
                    s["before"] += cum
                    s["mass"] = r["c"]
                    s["lo"], s["hi"] = r["clo"], r["chi"]
                    break
                cum += r["c"]
            else:  # pragma: no cover - counts are exact
                raise AssertionError(f"rank fell out of bracket for {t}")
    leftover = [
        t for t, s in state.items() if s["mass"] > bound and s["lo"] < s["hi"]
    ]
    if leftover:  # pragma: no cover - 1024^6 cells
        raise ValueError(
            f"selection bracket still >{bound} rows after "
            f"{SEL_MAX_DEPTH} passes for {sorted(leftover)}; raise "
            "SEL_MAX_DEPTH alongside the corpus"
        )

    out_rows = []
    for (key, q), s in sorted(state.items()):
        if s["lo"] == s["hi"]:
            out_rows.append((key, float(q), s["k"], float(s["lo"])))
            continue
        need = s["k"] - s["before"]
        got = (
            vals.filter(
                (F.col("k") == key)
                & (F.col("v") >= s["lo"])
                & (F.col("v") <= s["hi"])
            )
            .orderBy("v")
            .limit(need)
            .agg(F.max("v").alias("value"))
            .collect()[0]["value"]
        )
        out_rows.append((key, float(q), s["k"], float(got)))
    return spark.createDataFrame(out_rows, out_schema).orderBy(key_col, "q")


def q_events_grouped_exact_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact per-event-type p50/p90/p99 of the value column via keyed
    bracket descent (every event type advances in the same scans)."""
    ev = load_table(spark, sf_dir, "events")
    return grouped_exact_quantiles(ev, "event_type", "value")


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

    Same bracket descent, with the cell statistic sum(weight) instead
    of count (row count still bounds the narrow pass). Weights must be
    INTEGERS (cast to long): integer sums are associative, so the
    crossing point is independent of partitioning — a double weight
    column would make cumulative sums order-dependent and the oracle
    comparison a lie. The crossing threshold q x W is one double
    computed from the same (q, W) on both engines.
    """
    spark = df.sparkSession
    vals = (
        df.select(
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
        q: {
            "lo": g["lo"],
            "hi": g["hi"],
            "before_w": 0,
            "mass": g["n"],
            # the target is exceeded at the answer value: smallest v
            # with before_w + cum_w(v) >= t
            "t": float(q) * float(total_w),
        }
        for q in qs
    }

    for _ in range(SEL_MAX_DEPTH):
        active = {
            q: s
            for q, s in state.items()
            if s["mass"] > bound and s["lo"] < s["hi"]
        }
        if not active:
            break
        tagged = None
        for q, s in active.items():
            w = s["hi"] - s["lo"]
            cell = F.least(
                F.lit(bins - 1),
                F.floor((F.col("v") - F.lit(s["lo"])) / F.lit(w) * bins),
            ).cast("int")
            part = vals.filter(
                (F.col("v") >= s["lo"]) & (F.col("v") <= s["hi"])
            ).select(
                F.lit(float(q)).alias("q"), cell.alias("cell"), "v", "wt"
            )
            tagged = part if tagged is None else tagged.unionByName(part)
        cells = (
            tagged.groupBy("q", "cell")
            .agg(
                F.sum("wt").alias("cw"),
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("clo"),
                F.max("v").alias("chi"),
            )
            .collect()
        )
        by_q: dict[float, list] = {}
        for r in cells:
            by_q.setdefault(r["q"], []).append(r)
        for q, s in active.items():
            rows = sorted(by_q.get(float(q), []), key=lambda r: r["cell"])
            need = s["t"] - s["before_w"]
            cum = 0
            for r in rows:
                if cum + r["cw"] >= need:
                    s["before_w"] += cum
                    s["mass"] = r["c"]
                    s["lo"], s["hi"] = r["clo"], r["chi"]
                    break
                cum += r["cw"]
            else:  # pragma: no cover - cum(all cells) == W >= t
                raise AssertionError(f"weight target fell out for q={q}")
    leftover = [
        q for q, s in state.items() if s["mass"] > bound and s["lo"] < s["hi"]
    ]
    if leftover:  # pragma: no cover
        raise ValueError(
            f"weighted selection bracket still >{bound} rows after "
            f"{SEL_MAX_DEPTH} passes for q={sorted(leftover)}"
        )

    # final narrow pass: group the <= bound bracket rows by value,
    # cumulative-sum in value order (tiny window), take the crossing
    out_rows = []
    for q, s in sorted(state.items()):
        if s["lo"] == s["hi"]:
            out_rows.append((float(q), float(s["lo"])))
            continue
        grouped = (
            vals.filter((F.col("v") >= s["lo"]) & (F.col("v") <= s["hi"]))
            .groupBy("v")
            .agg(F.sum("wt").alias("gw"))
        )
        win = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        crossing = (
            grouped.withColumn("cum", F.sum("gw").over(win))
            .filter(
                F.col("cum") + F.lit(s["before_w"]) >= F.lit(s["t"])
            )
            .orderBy("v")
            .limit(1)
            .collect()
        )
        out_rows.append((float(q), float(crossing[0]["v"])))
    return spark.createDataFrame(out_rows, out_schema).orderBy("q")


def q_doc_weighted_length_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Byte-budget length quantiles: the doc length below which q of
    the corpus BYTES live (n_chars-weighted n_chars order statistics)
    — the statistic sequence-packing budgets actually need."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_exact_quantiles(docs, "n_chars", "n_chars")


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
    the flag comparison is then bitwise-reproducible.
    """
    spark = df.sparkSession
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    out_schema = (
        f"{group_col} string, n_events bigint, n_outliers bigint, "
        "outlier_rate double"
    )
    med_rows = exact_quantiles(vals, "v", qs=(0.5,), bins=bins, bound=bound).collect()
    if not med_rows:
        return spark.createDataFrame([], out_schema)
    m = med_rows[0]["value"]
    dev = vals.select("g", F.abs(F.col("v") - F.lit(m)).alias("d"))
    mad = exact_quantiles(dev, "d", qs=(0.5,), bins=bins, bound=bound).collect()[0][
        "value"
    ]
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


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier rates of the value column under
    the corpus-wide median/MAD screen (3 x MAD rule)."""
    ev = load_table(spark, sf_dir, "events")
    return mad_outliers(ev, "value", "event_type")
