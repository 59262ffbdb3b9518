"""Public column-function API (jema_js_spark.functions.columns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jema_js_spark.functions.columns import (
    js_multiple_of_col,
    js_rlike,
    js_rlike_is_jvm,
    js_round,
)
from jema_js_spark.kernel.jstypes import js_math_round, js_multiple_of


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [("abc\n",), ("xabc",), ("١٢٣",), (None,), ("a$b",)], "s string")


def test_js_rlike_jvm_path(spark, sdf):
    assert js_rlike_is_jvm("^a+$")
    got = [r[0] for r in sdf.select(js_rlike(F.col("s"), "abc$")).collect()]
    # JS $: absolute end — 'abc\n' must NOT match
    assert got == [False, True, False, None, False]
    digits = [r[0] for r in sdf.select(js_rlike(F.col("s"), r"^\d+$")).collect()]
    assert digits == [False, False, False, None, False]  # ASCII \d only


def test_js_rlike_metachar_in_class(spark, sdf):
    got = [r[0] for r in sdf.select(js_rlike(F.col("s"), "a[$]b")).collect()]
    assert got == [False, False, False, None, True]


def test_js_round_column(spark):
    df = spark.createDataFrame([(2.5,), (-2.5,), (0.4,), (-0.6,)], "x double")
    got = [r[0] for r in df.select(js_round(F.col("x"))).collect()]
    assert got == [3.0, -2.0, 0.0, -1.0]
    for v in (2.5, -2.5, 0.4, -0.6, 123.49999):
        assert js_math_round(v) == [r[0] for r in spark.createDataFrame(
            [(v,)], "x double").select(js_round(F.col("x"))).collect()][0]


def test_js_multiple_of_column_matches_kernel(spark):
    cases = [(-8599.3, 0.01), (1.0000000000000002, 0.5), (9.0, 3.0),
             (10.0, 4.0), (0.0075, 0.0001)]
    df = spark.createDataFrame([(v, m) for v, m in cases], "v double, m double")
    for v, m in cases:
        got = spark.createDataFrame([(v,)], "v double").select(
            js_multiple_of_col(F.col("v"), m)).collect()[0][0]
        assert got == js_multiple_of(v, m), (v, m)
