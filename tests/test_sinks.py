"""Sink operators: summary JSON, bump-chart rank table (O5/O6)."""

from __future__ import annotations

import json

from bigdataminingproject_spark.sources.sinks import (
    bump_chart_table,
    summary_as_dataframe,
    write_summary_json,
)


def test_write_summary_json_roundtrip(tmp_path):
    summary = {"processed": 10, "duplicates": {"total": 2, "rate": 0.2}}
    out = tmp_path / "summary.json"
    text = write_summary_json(summary, str(out))
    assert json.loads(text) == summary
    assert json.loads(out.read_text()) == summary


def test_summary_as_dataframe(spark):
    df = summary_as_dataframe(spark, {"a": 1})
    assert json.loads(df.first()["summary"]) == {"a": 1}


def test_bump_chart_table_rank_first_semantics(spark):
    rows = [
        # time, token, ratio — tie at t=1 between beta/alpha (2.0):
        # method='first' ⇒ deterministic tiebreak on token
        (1, "alpha", 2.0),
        (1, "beta", 2.0),
        (1, "gamma", 5.0),
        (2, "alpha", 9.0),
        (2, "beta", 3.0),
    ]
    df = spark.createDataFrame(rows, "boundary int, token string, ratio double")
    out = bump_chart_table(df, top_k=2).collect()
    t1 = [(r["token"], r["rank"]) for r in out if r["boundary"] == 1]
    t2 = [(r["token"], r["rank"]) for r in out if r["boundary"] == 2]
    assert t1 == [("gamma", 1), ("alpha", 2)]  # alpha beats beta on tie
    assert t2 == [("alpha", 1), ("beta", 2)]
