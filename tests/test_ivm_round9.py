"""Round-9 IVM state-representation tests: the counter-form histogram
and contingency-cell MI must rebuild the batch outputs EXACTLY from
folded state, including under arbitrary splits (the micro-batch
decomposition the streaming twins perform).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.histogram import (
    equidepth_from_counters,
    equidepth_histogram,
    fold_value_counters,
    value_counters,
)
from bigdataminingproject_spark.operators.profiling import (
    contingency_cells,
    fold_contingency_cells,
    mi_from_cells,
)


def _rows(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, x double"
    )


def test_counter_histogram_rebuilds_batch_exactly(spark):
    rnd = random.Random(13)
    # 2-dp values with heavy ties — the twin's operating domain
    vals = [round(rnd.expovariate(0.05), 2) for _ in range(3000)]
    vals += [7.25] * 400  # tie block
    df = _rows(spark, vals)
    batch = equidepth_histogram(df, "x", buckets=8).collect()
    counters = fold_value_counters(value_counters(df, "x"))
    rebuilt = equidepth_from_counters(counters, buckets=8).collect()
    assert rebuilt == batch


def test_counter_histogram_fold_over_splits(spark):
    rnd = random.Random(17)
    vals = [round(rnd.uniform(0, 50), 2) for _ in range(900)]
    df = _rows(spark, vals)
    parts = [
        value_counters(df.filter(F.col("id") % 3 == i), "x")
        for i in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    rebuilt = equidepth_from_counters(
        fold_value_counters(stacked), buckets=8
    ).collect()
    batch = equidepth_histogram(df, "x", buckets=8).collect()
    assert rebuilt == batch


def test_counter_histogram_empty_state(spark):
    df = _rows(spark, []).filter(F.lit(False))
    out = equidepth_from_counters(
        value_counters(df, "x"), buckets=8
    ).collect()
    assert out == []


def test_mi_cells_fold_over_splits(spark):
    rnd = random.Random(19)
    rows = [
        (i, rnd.choice("abcde"), rnd.randrange(0, 24))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, x string, y int")
    whole = mi_from_cells(
        contingency_cells(df, F.col("x"), F.col("y"))
    ).collect()
    parts = [
        contingency_cells(
            df.filter(F.col("id") % 4 == i), F.col("x"), F.col("y")
        )
        for i in range(4)
    ]
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    folded = mi_from_cells(fold_contingency_cells(stacked)).collect()
    assert folded == whole


def test_itemsim_delta_rule_matches_batch(spark):
    """The delta-join pair rule (cross term against prior state +
    within-batch pairs, duplicate-proof via the anti-join) must
    reproduce the batch pair counts EXACTLY under arbitrary batch
    slicing — including baskets that straddle batches and replayed
    duplicate rows."""
    import random

    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.recommend import (
        basket_pair_counts,
        cosine_topk_from_counts,
        item_cosine_topk,
    )

    rnd = random.Random(41)
    rows = []
    for o in range(60):
        items = rnd.sample(range(20), rnd.randint(1, 6))
        rows.extend((o, p) for p in items)
    rows += rows[:25]  # replayed duplicates must not double-count
    rnd.shuffle(rows)  # baskets straddle the slices
    df = spark.createDataFrame(rows, "o long, p long")
    batch = item_cosine_topk(df, "o", "p", k=3, min_co=2).collect()

    # simulate the twin's per-batch fold over 4 slices
    slices = [
        spark.createDataFrame(rows[i::4], "o long, p long")
        for i in range(4)
    ]
    state = None
    pair_parts, marg_parts = [], []
    for b in slices:
        delta = b.select("o", "p").distinct()
        if state is not None:
            delta = delta.join(state, ["o", "p"], "left_anti")
        delta = delta.localCheckpoint(eager=True)
        lo = delta.select("o", F.col("p").alias("a"))
        hi = delta.select("o", F.col("p").alias("b"))
        within = (
            lo.join(hi, "o").filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        if state is not None:
            oldrel = state.join(
                delta.select("o").distinct(), "o"
            ).select("o", F.col("p").alias("q"))
            cross = (
                delta.join(oldrel, "o")
                .filter(F.col("p") != F.col("q"))
                .select(
                    F.least("p", "q").alias("a"),
                    F.greatest("p", "q").alias("b"),
                )
            )
            within = within.unionByName(cross)
        pair_parts.append(
            within.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
        )
        marg_parts.append(
            delta.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
        )
        state = (
            delta if state is None else state.unionByName(delta)
        ).localCheckpoint(eager=True)
    pstate = pair_parts[0]
    for p in pair_parts[1:]:
        pstate = pstate.unionByName(p)
    mstate = marg_parts[0]
    for p in marg_parts[1:]:
        mstate = mstate.unionByName(p)
    co = (
        pstate.groupBy("a", "b").agg(F.sum("c").alias("co_count"))
        .filter(F.col("co_count") >= 2)
    )
    n = mstate.groupBy("p").agg(F.sum("c").alias("n_orders"))
    folded = cosine_topk_from_counts(co, n, k=3).collect()
    assert folded == batch
    # and the raw pair counts agree with the substrate too
    direct = {
        (r["a"], r["b"]): r["c"]
        for r in basket_pair_counts(df, "o", "p", min_co=1).collect()
    }
    via_delta = {
        (r["a"], r["b"]): r["co_count"]
        for r in pstate.groupBy("a", "b")
        .agg(F.sum("c").alias("co_count"))
        .collect()
    }
    assert via_delta == direct


def test_psi_counters_rebuild_batch_exactly(spark):
    """Counter-form PSI state must reproduce the batch drift report
    EXACTLY from folded per-(key, half, value) counters, including
    under arbitrary splits."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from bigdataminingproject_spark.operators.profiling import (
        fold_psi_counters,
        psi_drift,
        psi_from_counters,
        psi_value_counters,
    )

    rnd = random.Random(47)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(1500):
        k = rnd.choice(["a", "b", "c"])
        h = rnd.choice([5, 100, 300, 400, 600])
        lo, hi = (0, 60) if h < 360 else (20, 90)
        rows.append(
            (i, base + dt.timedelta(hours=h), k,
             round(rnd.uniform(lo, hi), 2))
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    batch = psi_drift(df).collect()
    parts = [
        psi_value_counters(df.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    rebuilt = psi_from_counters(fold_psi_counters(stacked)).collect()
    assert rebuilt == batch
