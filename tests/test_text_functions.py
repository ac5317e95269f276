"""Unit tests for text column functions (reference T1-T7/F5-F6 edge cases:
shingling from duplicate_detector.py:7-13, stopwords base_dataset_loader.py:12-14)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.text import (
    preprocess_body,
    remove_stopwords,
    shingles,
    tokenize,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _tok_of(spark, text: str):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(tokenize(F.col("t")).alias("v")).first()["v"]


def test_tokenize_lowercases_and_splits(spark):
    assert _tok_of(spark, "Hello,   WORLD! 42 times") == ["hello", "world", "times"]


def test_tokenize_empty_and_punct_only(spark):
    assert _tok_of(spark, "") == []
    assert _tok_of(spark, "!!! 123 ...") == []


def test_shingles_k3(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d"],)], "toks array<string>")
    out = df.select(shingles(F.col("toks"), 3).alias("v")).first()["v"]
    assert out == ["a b c", "b c d"]


def test_shingles_fewer_than_k_is_empty(spark):
    # duplicate_detector.py:7-13: len<k => []
    df = spark.createDataFrame([(["a", "b"],)], "toks array<string>")
    assert df.select(shingles(F.col("toks"), 3).alias("v")).first()["v"] == []


def test_shingles_k1_degenerates_to_tokens(spark):
    df = spark.createDataFrame([(["a", "b"],)], "toks array<string>")
    assert df.select(shingles(F.col("toks"), 1).alias("v")).first()["v"] == [
        "a",
        "b",
    ]


def test_stopword_and_skipword_removal(spark):
    df = spark.createDataFrame(
        [(["the", "quick", "u", "cindy", "fox"],)], "toks array<string>"
    )
    out = df.select(remove_stopwords(F.col("toks")).alias("v")).first()["v"]
    assert out == ["quick", "fox"]


def test_skipwords_toggle(spark):
    df = spark.createDataFrame([(["u", "fox"],)], "toks array<string>")
    out = df.select(
        remove_stopwords(F.col("toks"), use_skipwords=False).alias("v")
    ).first()["v"]
    assert out == ["u", "fox"]


def test_preprocess_body_roundtrip(spark):
    df = spark.createDataFrame(
        [("The Quick brown FOX, jumped; over 2 lazy dogs!",)], "t string"
    )
    out = df.select(preprocess_body(F.col("t")).alias("v")).first()["v"]
    assert out == "quick brown fox jumped over lazy dogs"


def test_rolling_fingerprint_order_sensitive(spark):
    from bigdataminingproject_spark.operators.textstats import (
        rolling_fingerprint,
    )

    df = spark.createDataFrame(
        [(0, ["a", "b", "c"]), (1, ["c", "b", "a"]), (2, ["a", "b", "c"])],
        "i long, toks array<string>",
    )
    out = {
        r["i"]: r["h"]
        for r in df.select(
            "i", rolling_fingerprint(F.col("toks")).alias("h")
        ).collect()
    }
    assert out[0] == out[2]  # deterministic
    assert out[0] != out[1]  # order matters (md5 fingerprint also differs,
    # but rolling hash keeps incremental/streamable state)
