"""One-parse literal arrays (functions/lits.py) — value fidelity vs the
per-element ``F.array(*map(F.lit, ...))`` form they replace (round 11:
the PQ/IVF/stopword plans now build their inlined constants through
``lit_array``, so equality here is what keeps those plans bit-identical
to the oracle-attested round-10 plans)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.functions.lits import (
    lit_array,
    lit_double_array,
)


def _both(spark, vals, builder):
    df = spark.range(1)
    ref = df.select(
        F.array(*[F.lit(v) for v in vals]).alias("x")
    ).collect()[0][0]
    got = df.select(builder(vals).alias("x")).collect()[0][0]
    return ref, got


def test_float_arrays_bit_identical(spark):
    vals = [
        1e-07,
        -3.5,
        0.1 + 0.2,
        123456789.123456789,
        2.0**-45,
        -1e300,
        0.0,
        -0.0,
        math.pi,
    ]
    ref, got = _both(spark, vals, lit_array)
    assert [struct.pack("d", v) for v in ref] == [
        struct.pack("d", v) for v in got
    ]


def test_double_array_coerces_ints(spark):
    ref = (
        spark.range(1)
        .select(F.array(*[F.lit(float(v)) for v in [1, 2, 3]]).alias("x"))
        .collect()[0][0]
    )
    got = (
        spark.range(1)
        .select(lit_double_array([1, 2, 3]).alias("x"))
        .collect()[0][0]
    )
    assert ref == got


def test_int_arrays_match_including_bounds(spark):
    vals = [0, -5, 2**62, -(2**63), 2**63 - 1]
    ref, got = _both(spark, vals, lit_array)
    assert ref == got


def test_string_arrays_match_with_escapes(spark):
    vals = ["it's", "back\\slash", "plain", "tab\there", "unié"]
    ref, got = _both(spark, vals, lit_array)
    assert ref == got


def test_nonfinite_falls_back(spark):
    # fallback path must still produce correct values (mixed types are
    # not tested: Spark's own F.array(F.lit(1), F.lit("a")) rejects
    # them, so the fallback merely mirrors that)
    for vals in ([float("nan"), 1.0], [float("inf")]):
        ref, got = _both(spark, vals, lit_array)
        assert len(ref) == len(got)
        for r, g in zip(ref, got):
            if isinstance(r, float) and math.isnan(r):
                assert math.isnan(g)
            else:
                assert r == g


def test_empty_list_falls_back(spark):
    got = (
        spark.range(1)
        .select(lit_array([]).alias("x"))
        .collect()[0][0]
    )
    assert got == []


@pytest.mark.parametrize("n", [512])
def test_large_double_array_roundtrip(spark, n):
    vals = [(-1.0) ** i * (i * 1.1) ** 3 * 10.0**-5 for i in range(n)]
    ref, got = _both(spark, vals, lit_array)
    assert [struct.pack("d", v) for v in ref] == [
        struct.pack("d", v) for v in got
    ]
