"""Pin the pandas -> Spark ingestion semantics (VERDICT r1 missing #4).

The reference is dual-backend (rules/base.py:164-212); this engine converts
pandas input through ``spark.createDataFrame`` (config.py execute,
BaseRule.evaluate). These tests pin the missing-value corners where that
conversion could silently diverge from the reference's pandas semantics:
NaN in floats, NaT in datetimes, nullable extension dtypes, None in object
columns — all must behave as MISSING for every rule (the engine's nullify()
normalises NaN -> NULL; tests prove the end-to-end behavior, not the units).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from gchq_data_quality_spark import (
    CompletenessRule,
    DataQualityConfig,
    TimelinessStaticRule,
    UniquenessRule,
    ValidityNumericalRangeRule,
)


def test_nan_in_float_column_is_missing(spark):
    pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0, np.nan]})
    result = CompletenessRule(field="x").evaluate(pdf)
    assert result.records_evaluated == 4
    assert result.pass_rate == pytest.approx(0.5)


def test_nan_skipped_not_failed_by_range_rule(spark):
    pdf = pd.DataFrame({"x": [5.0, np.nan, 500.0]})
    result = ValidityNumericalRangeRule(field="x", min_value=0, max_value=100).evaluate(pdf)
    assert result.records_evaluated == 2  # NaN skipped, not failed
    assert result.pass_rate == pytest.approx(0.5)  # 500 fails


def test_nullable_int64_extension_dtype(spark):
    pdf = pd.DataFrame({"n": pd.array([1, None, 3], dtype="Int64")})
    result = CompletenessRule(field="n").evaluate(pdf)
    assert result.records_evaluated == 3
    assert result.pass_rate == pytest.approx(2 / 3)


def test_nat_in_datetime_column(spark):
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-05", None, "2024-02-01"])}
    )
    result = TimelinessStaticRule(
        field="ts", start_date="2024-01-01", end_date="2024-01-31"
    ).evaluate(pdf)
    assert result.records_evaluated == 2  # NaT skipped
    assert result.pass_rate == pytest.approx(0.5)


def test_none_in_object_string_column(spark):
    pdf = pd.DataFrame({"s": ["a", None, "b", None, "c"]})
    result = CompletenessRule(field="s").evaluate(pdf)
    assert result.pass_rate == pytest.approx(0.6)


def test_uniqueness_ignores_nan(spark):
    pdf = pd.DataFrame({"x": [1.0, 1.0, 2.0, np.nan, np.nan]})
    result = UniquenessRule(field="x").evaluate(pdf)
    # reference semantics: distinct non-null / non-null rows = 2/3
    assert result.records_evaluated == 3
    assert result.pass_rate == pytest.approx(2 / 3)


def test_config_execute_accepts_pandas(spark):
    config = DataQualityConfig(
        dataset_name="pandas_in",
        rules=[
            CompletenessRule(field="x", rule_id="complete"),
            ValidityNumericalRangeRule(field="x", min_value=0, rule_id="nonneg"),
        ],
    )
    pdf = pd.DataFrame({"x": [1.0, -2.0, np.nan]})
    report = config.execute(pdf)
    by_id = {r.rule_id: r for r in report.results}
    assert by_id["complete"].pass_rate == pytest.approx(2 / 3)
    assert by_id["nonneg"].records_evaluated == 2
    assert by_id["nonneg"].pass_rate == pytest.approx(0.5)
    assert report.results[0].dataset_name == "pandas_in"


def test_mixed_date_objects_column(spark):
    pdf = pd.DataFrame({"d": [dt.date(2024, 1, 10), None, dt.date(2024, 3, 1)]})
    result = TimelinessStaticRule(
        field="d", start_date="2024-01-01", end_date="2024-01-31"
    ).evaluate(pdf)
    assert result.records_evaluated == 2
    assert result.pass_rate == pytest.approx(0.5)
