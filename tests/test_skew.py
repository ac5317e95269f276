"""Skew-mitigation semantics: every guarded path must return results
identical to its direct counterpart on a pathologically skewed input
(one key/stratum owning half the rows) — the shape where the direct
plan's single window/sort task becomes the wall clock at 100 TB."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.events import latest_by_key
from bigdataminingproject_spark.operators.sampling import domain_cap
from bigdataminingproject_spark.plans.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: one hot key with 90% of rows
    left = spark.createDataFrame(
        [(1 if i < 900 else i % 50, i) for i in range(1000)], "k int, v int"
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(50)], "k int, name string")
    plain = plain_sorted = sorted(
        (r["k"], r["v"], r["name"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, "k", salt=8).collect()
    )
    assert salted == plain_sorted
    assert len(salted) == 1000  # every left row matched exactly once


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, name string")
    rows = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, "k", salt=4, how="left").collect()
    }
    assert rows == {(1, "a", "x"), (99, "b", None)}


def _skewed_docs(spark):
    """2000 docs, one hot stratum with 50% of rows, 10 cold strata."""
    rows = [
        (
            i,
            "hot" if i % 2 == 0 else f"cold{i % 20}",
            "x" * (1 + (i * 37) % 400),
        )
        for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_domain_cap_hot_path_matches_direct(spark):
    docs = _skewed_docs(spark)
    direct = [tuple(r) for r in domain_cap(docs, cap=15).collect()]
    # threshold 100: the hot stratum (1000 rows) salts, cold strata don't
    hot = [
        tuple(r)
        for r in domain_cap(docs, cap=15, hot_threshold=100).collect()
    ]
    assert hot == direct
    assert len(direct) == 15 * 11  # every stratum filled its cap


def test_domain_cap_hot_path_all_strata_hot(spark):
    docs = _skewed_docs(spark)
    direct = [tuple(r) for r in domain_cap(docs, cap=5).collect()]
    # threshold 0: every stratum takes the salted two-phase path
    hot = [
        tuple(r)
        for r in domain_cap(
            docs, cap=5, hot_threshold=0, salt_buckets=4
        ).collect()
    ]
    assert hot == direct


def test_domain_cap_hot_path_cap_larger_than_stratum(spark):
    # cap above small-stratum size: salted phase must not drop rows
    rows = [(i, "hot" if i < 90 else "tiny", f"{'y' * (i + 1)}") for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    direct = [tuple(r) for r in domain_cap(docs, cap=20).collect()]
    hot = [
        tuple(r)
        for r in domain_cap(
            docs, cap=20, hot_threshold=50, salt_buckets=8
        ).collect()
    ]
    assert hot == direct
    assert sum(1 for r in direct if r[0] == "tiny") == 10


def _skewed_events(spark):
    """5000 events; one hot user owns half, ties in ts broken by id."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            1 if i % 2 == 0 else 1 + (i % 100),
            f"type{i % 5}",
            base + datetime.timedelta(seconds=(i * 13) % 1000),
            float(i % 97),
        )
        for i in range(5000)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )


def test_latest_by_key_hot_path_matches_window(spark):
    ev = _skewed_events(spark)
    cols = ["user_id", "event_id", "event_type", "ts", "value"]
    direct = sorted(
        tuple(r) for r in latest_by_key(ev).select(*cols).collect()
    )
    hot = sorted(
        tuple(r)
        for r in latest_by_key(ev, hot_keys=True).select(*cols).collect()
    )
    assert hot == direct
    assert len(hot) == 51  # one row per distinct user


def test_latest_by_key_hot_path_ts_ties_use_tiebreak(spark):
    # every event of a user shares one ts — tiebreak alone must decide
    base = datetime.datetime(2024, 6, 1)
    ev = spark.createDataFrame(
        [(i, i % 3, "t", base, 1.0) for i in range(30)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["event_id"])
        for r in latest_by_key(ev, hot_keys=True).collect()
    }
    assert got == {(0, 27), (1, 28), (2, 29)}
