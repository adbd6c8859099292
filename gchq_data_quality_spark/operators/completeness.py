"""CompletenessRule: proportion of non-null values.

Parity: reference rules/completeness.py:45-58 — evaluates ALL rows
(skip_if_null frozen to 'never'), passing = value not null after na_values
replacement. Compiles to ``sum(isNotNull)`` / ``count(*)`` — pure map-side
conditional counting, no shuffle beyond the final 1-row reduce.
"""

from __future__ import annotations

from typing import Literal

from pydantic import Field
from pyspark.sql import Column

from gchq_data_quality_spark.models import DamaFramework, DataQualityDimension
from gchq_data_quality_spark.operators.base import BaseRule


class CompletenessRule(BaseRule):
    function: Literal["completeness"] = "completeness"
    data_quality_dimension: DataQualityDimension = Field(
        default=DamaFramework.Completeness
    )
    skip_if_null: Literal["all", "any", "never"] = Field(
        default="never", frozen=True
    )

    def _passing(self, prepared: dict[str, Column]) -> Column:
        return prepared[self.field].isNotNull()
