"""Unit semantics for HBOS density anomaly scoring
(operators/anomaly.py) — planted-anomaly recall and degenerate shapes;
q_events_hbos carries the DuckDB gate."""

from __future__ import annotations

import math

from bigdataminingproject_spark.operators.anomaly import hbos_scores


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )


def test_planted_outlier_scores_highest(spark):
    # 40 clustered common-type rows + one far value of a unique type
    rows = [(i, "click", 10.0 + (i % 5) * 0.1) for i in range(40)]
    rows.append((99, "fraud", 1000.0))
    out = hbos_scores(_df(spark, rows)).orderBy("score").collect()
    assert out[-1]["event_id"] == 99
    # the outlier sits alone in its bucket AND its category:
    # score = -ln(1/41) - ln(1/41)
    assert abs(out[-1]["score"] - 2 * -math.log(1 / 41)) < 1e-6


def test_score_decomposes_into_exact_marginals(spark):
    # one bucket (identical values) -> value term is -ln(1) = 0;
    # score reduces to the categorical frequency term
    rows = [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 5.0)]
    out = {r["event_id"]: r["score"] for r in hbos_scores(_df(spark, rows)).collect()}
    assert abs(out[3] - round(-math.log(1 / 3), 6)) < 1e-9
    assert abs(out[1] - round(-math.log(2 / 3), 6)) < 1e-9


def test_null_features_excluded_from_population(spark):
    rows = [(1, "a", 1.0), (2, None, 2.0), (3, "a", None), (4, "a", 1.0)]
    out = hbos_scores(_df(spark, rows)).collect()
    assert sorted(r["event_id"] for r in out) == [1, 4]
    # N = 2, both in same bucket+type: score = -ln(1)-ln(1) = 0
    assert all(r["score"] == 0.0 for r in out)


def test_max_value_lands_in_top_bucket_not_overflow(spark):
    rows = [(i, "a", float(i)) for i in range(1, 9)]
    out = {r["event_id"]: r["bucket"] for r in hbos_scores(_df(spark, rows)).collect()}
    assert out[8] == 8  # v == hi capped by least(), not bucket 9
    assert out[1] == 1


def test_empty_input_yields_empty_frame(spark):
    out = hbos_scores(_df(spark, []))
    assert out.count() == 0
