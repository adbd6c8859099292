"""Validity rules: regex match and numerical range.

Parity notes:
- ValidityRegexRule (reference rules/validity.py:79-93): coerce to string
  preserving NULL, pass = pandas ``str.match`` — anchored at string START,
  not a full match and not a search (pinned by
  tests/data/validity_regex.yaml:32-40 where '[a-z]+' fails 'Abc'). We
  therefore compile to ``rlike('^(?:<pattern>)')``.
- ValidityNumericalRangeRule (reference rules/validity.py:150-181): coerce
  with ``pd.to_numeric(errors='coerce')`` — unparseable values become NULL and
  are SKIPPED, not failed (tests/data/validity_numerical_range.yaml:57-66);
  ``try_cast('double')`` reproduces this exactly. Bounds inclusive, None ->
  ±infinity (validators at rules/validity.py:155-169).
"""

from __future__ import annotations

import math
from typing import Literal

from pydantic import Field, field_validator
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gchq_data_quality_spark.models import DamaFramework, DataQualityDimension
from gchq_data_quality_spark.operators.base import BaseRule
from gchq_data_quality_spark.plans.coercion import to_numeric, to_string_preserving_null


class ValidityRegexRule(BaseRule):
    function: Literal["validity_regex"] = "validity_regex"
    regex_pattern: str = Field(..., description="Regex the value must match at its start")
    data_quality_dimension: DataQualityDimension = Field(default=DamaFramework.Validity)

    def _coerce(self, col: Column, dtype: T.DataType) -> tuple[Column, T.DataType]:
        return to_string_preserving_null(col, dtype)

    def _passing(self, prepared: dict[str, Column]) -> Column:
        return prepared[self.field].rlike(f"^(?:{self.regex_pattern})")


class ValidityNumericalRangeRule(BaseRule):
    function: Literal["validity_numerical_range"] = "validity_numerical_range"
    min_value: float = Field(default=-math.inf, description="Minimum valid value (inclusive)")
    max_value: float = Field(default=math.inf, description="Maximum valid value (inclusive)")
    data_quality_dimension: DataQualityDimension = Field(default=DamaFramework.Validity)

    @field_validator("min_value", mode="before")
    @classmethod
    def _none_min_is_neg_inf(cls, value: float | None) -> float:
        return -math.inf if value is None else value

    @field_validator("max_value", mode="before")
    @classmethod
    def _none_max_is_inf(cls, value: float | None) -> float:
        return math.inf if value is None else value

    def _coerce(self, col: Column, dtype: T.DataType) -> tuple[Column, T.DataType]:
        return to_numeric(col, dtype)

    def _passing(self, prepared: dict[str, Column]) -> Column:
        col = prepared[self.field]
        return (col >= F.lit(self.min_value)) & (col <= F.lit(self.max_value))
