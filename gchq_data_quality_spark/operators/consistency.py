"""ConsistencyRule: boolean expressions over row columns, optionally if/then.

Parity: reference rules/consistency.py:15-172. The expression dialect is
pandas-eval with backticked columns; our engine compiles it ONCE to a Catalyst
Column (plans/expressions.py) instead of running ``pd.eval`` per partition.

Semantics pinned by tests/data/consistency.yaml:38-100:
- plain string expression: evaluated = NOT skip_if_null (default 'all'),
  passing = expression
- {'if': ..., 'then': ...}: the if-clause RESTRICTS the evaluated set —
  evaluated = if_expr AND NOT skip (consistency.py:132-143); passing = then
- NULL comparisons yield NULL which counts as not-passing (fillna(False))

Bonus correctness over the reference: expressions containing global
statistics (e.g. means) silently became per-partition statistics in the
reference's mapInPandas path (docs/python-pyspark.md:98,285); compiled global
expressions have no such trap.
"""

from __future__ import annotations

from typing import Literal, Self

from pydantic import Field, field_validator
from pyspark.sql import Column
from pyspark.sql import functions as F

from gchq_data_quality_spark.models import DamaFramework, DataQualityDimension
from gchq_data_quality_spark.operators.base import BaseRule
from gchq_data_quality_spark.plans.expressions import (
    compile_expression,
    extract_columns_from_expression,
)


class ConsistencyRule(BaseRule):
    function: Literal["consistency"] = "consistency"
    expression: str | dict[str, str] = Field(
        ...,
        description=(
            "A pandas-eval compatible boolean expression (backticks around "
            "column names), or a dict with 'if' and 'then' keys."
        ),
    )
    skip_if_null: Literal["all", "any", "never"] = Field(default="all")
    data_quality_dimension: DataQualityDimension = Field(
        default=DamaFramework.Consistency
    )

    @field_validator("expression")
    @classmethod
    def _validate_if_then(cls, value: str | dict) -> str | dict:
        if isinstance(value, dict) and not all(k in value for k in ("if", "then")):
            raise ValueError(
                f"Expression dict must contain both 'if' and 'then' keys, you have {value.keys()}"
            )
        return value

    def columns_used(self) -> list[str]:
        if isinstance(self.expression, str):
            cols = set(extract_columns_from_expression(self.expression))
        else:
            cols = set(extract_columns_from_expression(self.expression["if"]))
            cols |= set(extract_columns_from_expression(self.expression["then"]))
        cols.add(self.field)
        return sorted(cols)

    def _evaluated(self, prepared: dict[str, Column]) -> Column:
        not_skipped = ~self._skip_mask(prepared)
        if isinstance(self.expression, str):
            return not_skipped
        if_expr = compile_expression(self.expression["if"], prepared.__getitem__)
        return F.coalesce(if_expr, F.lit(False)) & not_skipped

    def _passing(self, prepared: dict[str, Column]) -> Column:
        expr = (
            self.expression if isinstance(self.expression, str) else self.expression["then"]
        )
        return compile_expression(expr, prepared.__getitem__)
