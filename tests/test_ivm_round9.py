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
