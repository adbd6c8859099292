"""Unit tests for the pandas-eval -> Column translator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.errors import DQFunctionError
from gchq_data_quality_spark.plans.expressions import (
    compile_expression,
    extract_backticked_fields,
    extract_columns_from_expression,
)


def _eval(spark, df, expr):
    col = compile_expression(expr, F.col)
    return [row["r"] for row in df.select(col.alias("r")).collect()]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, 10, "active", "a@co.com", None),
            (5, 2, "inactive", "b@x.org", 3.5),
            (None, 7, None, None, -2.0),
        ],
        "a int, b int, status string, email string, v double",
    )


def test_extractors():
    assert extract_backticked_fields("`a` > `b` & `a` == 1") == ["a", "b", "a"]
    assert sorted(extract_columns_from_expression("`a` > `b`")) == ["a", "b"]
    with pytest.raises(ValueError, match="backticks"):
        extract_columns_from_expression("a > b")


def test_comparisons(spark, df):
    assert _eval(spark, df, "`a` < `b`") == [True, False, None]
    # pandas-parser precedence: & binds LOOSER than comparisons
    assert _eval(spark, df, "`a` >= 1 & `b` <= 10") == [True, True, None]
    # three-valued logic: NULL & False = False (pandas BooleanDtype agrees)
    assert _eval(spark, df, "`a` >= 2 & `b` <= 5") == [False, True, False]
    assert _eval(spark, df, "(`a` > 2) | (`b` > 5)") == [True, True, True]
    assert _eval(spark, df, "`a` == 1 and `b` == 10") == [True, False, False]
    assert _eval(spark, df, "not (`a` == 1)") == [False, True, None]


def test_chained_comparison(spark, df):
    assert _eval(spark, df, "1 <= `a` <= 4") == [True, False, None]


def test_in_notin(spark, df):
    assert _eval(spark, df, "`status` in ['active', 'paused']") == [True, False, None]
    assert _eval(spark, df, "`status` not in ['active']") == [False, True, None]


def test_arithmetic_abs(spark, df):
    assert _eval(spark, df, "abs(`v`) >= 2") == [None, True, True]
    assert _eval(spark, df, "`a` + `b` == 11") == [True, False, None]
    assert _eval(spark, df, "`b` % 2 == 0") == [True, True, False]


def test_null_methods(spark, df):
    assert _eval(spark, df, "`a`.notnull()") == [True, True, False]
    assert _eval(spark, df, "`a`.isnull()") == [False, False, True]
    assert _eval(spark, df, "`v`.fillna(0.0) <= 0") == [True, False, True]


def test_str_methods(spark, df):
    # .str.match anchors at the START (re.match), not full match
    assert _eval(spark, df, "`email`.str.match('[a-z]@')") == [True, True, None]
    assert _eval(spark, df, "`email`.str.endswith('.com')") == [True, False, None]
    assert _eval(spark, df, "`email`.str.startswith('a')") == [True, False, None]
    assert _eval(spark, df, "`email`.str.contains('@')") == [True, True, None]
    assert _eval(spark, df, "`email`.str.len() > 7") == [True, False, None]


def test_str_match_not_search(spark):
    # pinned by tests/data/validity_regex.yaml:32-40 — '[a-z]+' must fail 'Abc'
    df = spark.createDataFrame([("abc",), ("Abc",)], "s string")
    col = compile_expression("`s`.str.match('[a-z]+')", F.col)
    assert [r[0] for r in df.select(col).collect()] == [True, False]


def test_dt_accessors(spark):
    df = spark.createDataFrame([("2024-03-15 10:30:00",)], "t string").select(
        F.col("t").cast("timestamp").alias("t")
    )
    assert _eval(spark, df, "`t`.dt.year == 2024") == [True]
    assert _eval(spark, df, "`t`.dt.month == 3") == [True]
    assert _eval(spark, df, "`t`.dt.day == 15") == [True]
    assert _eval(spark, df, "`t`.dt.hour == 10") == [True]
    # 2024-03-15 is a Friday -> pandas dayofweek 4
    assert _eval(spark, df, "`t`.dt.dayofweek == 4") == [True]


def test_unsupported_raises():
    with pytest.raises(DQFunctionError):
        compile_expression("`a`.rolling(3).mean() > 1", F.col)
    with pytest.raises(DQFunctionError):
        compile_expression("__import__('os')", F.col)
    with pytest.raises(DQFunctionError):
        compile_expression("`a` <<", F.col)
