"""UniquenessRule: proportion of distinct non-null values.

Parity: reference rules/uniqueness.py:87-167. pass_rate = distinct non-null
values / non-null rows — the pandas mask ``~duplicated()`` (first occurrence
passes) sums to exactly the distinct count, so both formulations agree.

This is the ONE rule that cannot be a per-row expression without global
context (duplicates across partitions are invisible per-partition — the
reference says the same at uniqueness.py:108-112). We compile it to a pair of
AGGREGATE expressions (``count`` / ``count_distinct``) that ride in the same
single-job ``agg`` as every other rule's conditional sums, instead of the
reference's three separate Spark jobs (count, distinct().count, groupBy
sample at uniqueness.py:133-162).

Scale note: exact ``count_distinct`` shuffles. For 10^12-row runs set
``approximate=True`` to use ``approx_count_distinct`` (HLL++, map-side only,
default rsd 5%) — flagged as non-label-exact, use for monitoring not audits.

Per-row mode (for keep/drop pipelines): ``row_passing_column`` gives a
first-occurrence mask via ``row_number`` over a window partitioned by the
field — requires a stable ordering column (e.g. image_id) for determinism.
"""

from __future__ import annotations

from typing import Literal

from pydantic import Field
from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from gchq_data_quality_spark.models import DamaFramework, DataQualityDimension
from gchq_data_quality_spark.operators.base import BaseRule, CompiledRule, DtypeOf, Resolver


class UniquenessRule(BaseRule):
    function: Literal["uniqueness"] = "uniqueness"
    data_quality_dimension: DataQualityDimension = Field(
        default=DamaFramework.Uniqueness
    )
    approximate: bool = Field(
        default=False,
        description=(
            "Use approx_count_distinct (HLL++) instead of exact count_distinct. "
            "No shuffle, ~5% relative error; not for label-exact audits."
        ),
    )

    def _passing(self, prepared: dict[str, Column]) -> Column:  # pragma: no cover
        raise NotImplementedError("Uniqueness compiles to global aggregates")

    def compile(self, resolver: Resolver, dtype_of: DtypeOf) -> CompiledRule:
        prepared = self._prepare(resolver, dtype_of)
        col = prepared[self.field]
        distinct = (
            F.approx_count_distinct(col) if self.approximate else F.count_distinct(col)
        )
        return CompiledRule(
            rule=self,
            columns_used=self.columns_used(),
            evaluated=col.isNotNull(),
            passing=F.lit(None).cast("boolean"),
            prepared=prepared,
            agg_evaluated=F.count(col),
            agg_passing=distinct,
        )

    def row_passing_column(
        self, resolver: Resolver, dtype_of: DtypeOf, order_by: str
    ) -> Column:
        """First-occurrence-passes mask for per-row keep/drop pipelines."""
        prepared = self._prepare(resolver, dtype_of)
        col = prepared[self.field]
        w = Window.partitionBy(col).orderBy(F.col(order_by))
        return col.isNotNull() & (F.row_number().over(w) == 1)
