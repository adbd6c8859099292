"""AccuracyRule: membership of a valid-values list (or exclusion list).

Parity: reference rules/accuracy.py:60-78. Compiles to ``isin`` which Catalyst
optimises to ``In``/``InSet`` (hash-set probe in codegen). For authority lists
beyond ~10^4 values prefer a broadcast left-semi join — see
``gchq_data_quality_spark.functions.membership.isin_large`` for that path.
"""

from __future__ import annotations

from typing import Any, Literal

from pydantic import Field
from pyspark.sql import Column

from gchq_data_quality_spark.models import DamaFramework, DataQualityDimension
from gchq_data_quality_spark.operators.base import BaseRule


class AccuracyRule(BaseRule):
    function: Literal["accuracy"] = "accuracy"
    valid_values: list[Any] = Field(..., description="List of valid values")
    inverse: bool | None = Field(
        default=False,
        description="If true, values must NOT be in valid_values",
    )
    data_quality_dimension: DataQualityDimension = Field(default=DamaFramework.Accuracy)

    def _passing(self, prepared: dict[str, Column]) -> Column:
        mask = prepared[self.field].isin(self.valid_values)
        return ~mask if self.inverse else mask
