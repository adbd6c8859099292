"""Timeliness rules: datetime window checks, absolute and relative.

Parity: reference rules/timeliness.py.
- Everything is coerced to UTC timestamps; date-only strings = midnight UTC;
  unparseable values -> NULL -> skipped (pinned by
  tests/data/timeliness_static.yaml "An invalid datetime string": invalid
  dates turn to NULL, a validity rule picks those up).
- TimelinessStaticRule (timeliness.py:45-133): start/end inclusive, either
  optional, at least one required (timeliness.py:120-126).
- TimelinessRelativeRule (timeliness.py:136-307): per-row window
  [ref + start_td, ref + end_td]; reference is a fixed date, another COLUMN
  (row-wise comparison, timeliness.py:256-265), or "now" with a warning
  (timeliness.py:225-239). Timedeltas accept pandas strings ('30d'),
  numbers (nanoseconds) or timedelta objects (timeliness.py:208-215 note).

Both compile to pure Column comparisons — interval arithmetic stays inside
codegen; the per-row reference_column case is a row-wise expression, never a
join.
"""

from __future__ import annotations

from datetime import UTC, datetime, timedelta
from typing import Literal
from warnings import warn

import pandas as pd
from pydantic import Field, field_validator, model_validator
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gchq_data_quality_spark.models import (
    DamaFramework,
    DataQualityDimension,
    UTCDateTime,
)
from gchq_data_quality_spark.operators.base import BaseRule
from gchq_data_quality_spark.plans.coercion import to_utc_timestamp


def _utc_naive(dt: datetime) -> datetime:
    """tz-aware -> naive UTC (Spark lit timestamps are session-tz naive; the
    engine pins the session timezone to UTC)."""
    if dt.tzinfo is not None:
        return dt.astimezone(UTC).replace(tzinfo=None)
    return dt


def _shift(col: Column, td: timedelta) -> Column:
    micros = round(td.total_seconds() * 1_000_000)
    return col + F.expr(f"INTERVAL '{micros}' MICROSECOND")


class TimelinessBaseRule(BaseRule):
    dayfirst: bool = Field(
        default=False,
        description="Parse ambiguous date strings as day-first (DD/MM/YYYY).",
    )
    data_quality_dimension: DataQualityDimension = Field(
        default=DamaFramework.Timeliness
    )

    def _coerce(self, col: Column, dtype: T.DataType) -> tuple[Column, T.DataType]:
        return to_utc_timestamp(col, dtype, dayfirst=self.dayfirst)


class TimelinessStaticRule(TimelinessBaseRule):
    function: Literal["timeliness_static"] = "timeliness_static"
    start_date: UTCDateTime = Field(
        default=None, description="Earliest allowed timestamp (inclusive)"
    )
    end_date: UTCDateTime = Field(
        default=None, description="Latest allowed timestamp (inclusive)"
    )

    @model_validator(mode="after")
    def _at_least_one_date(self) -> "TimelinessStaticRule":
        if self.start_date is None and self.end_date is None:
            raise ValueError(
                "At least one of 'start_date' or 'end_date' must be provided. "
                f"{self.start_date=}, {self.end_date=}"
            )
        return self

    def _passing(self, prepared: dict[str, Column]) -> Column:
        col = prepared[self.field]
        mask = F.lit(True)
        if self.start_date is not None:
            mask = mask & (col >= F.lit(_utc_naive(self.start_date)))
        if self.end_date is not None:
            mask = mask & (col <= F.lit(_utc_naive(self.end_date)))
        return mask


class TimelinessRelativeRule(TimelinessBaseRule):
    function: Literal["timeliness_relative"] = "timeliness_relative"
    start_timedelta: timedelta | None = Field(
        default=None, description="Minimum allowed offset from the reference"
    )
    end_timedelta: timedelta | None = Field(
        default=None, description="Maximum allowed offset from the reference"
    )
    reference_date: UTCDateTime | None = Field(
        default=None, description="Fixed UTC reference (mutually exclusive with reference_column)"
    )
    reference_column: str | None = Field(
        default=None, description="Per-row reference column (mutually exclusive with reference_date)"
    )

    @field_validator("start_timedelta", "end_timedelta", mode="before")
    @classmethod
    def _parse_timedelta(cls, value):
        """pandas to_timedelta dialect: '30d', '-1d', numbers = nanoseconds."""
        if value is None or isinstance(value, timedelta):
            return value
        td = pd.to_timedelta(value)
        if pd.isna(td):
            raise ValueError(f"Invalid timedelta: {value!r}")
        return td.to_pytimedelta()

    @model_validator(mode="after")
    def _check_reference(self) -> "TimelinessRelativeRule":
        if self.reference_date is not None and self.reference_column is not None:
            raise ValueError(
                "Provide only reference_date OR reference_column, not both. "
                f"reference_date={self.reference_date}, reference_column={self.reference_column}"
            )
        if self.reference_date is None and self.reference_column is None:
            self.reference_date = datetime.now(UTC)
            warn(
                "No reference_date or reference_column given; defaulting to a "
                f"reference_date of 'now': ({self.reference_date}).",
                stacklevel=2,
            )
        return self

    @model_validator(mode="after")
    def _at_least_one_timedelta(self) -> "TimelinessRelativeRule":
        if self.start_timedelta is None and self.end_timedelta is None:
            raise ValueError(
                "At least one of 'start_timedelta' or 'end_timedelta' must be "
                f"provided. {self.start_timedelta=}, {self.end_timedelta=}"
            )
        return self

    def columns_used(self) -> list[str]:
        cols = [self.field]
        if self.reference_column:
            cols.append(self.reference_column)
        return cols

    def _passing(self, prepared: dict[str, Column]) -> Column:
        col = prepared[self.field]
        if self.reference_column:
            ref = prepared[self.reference_column]
        else:
            ref = F.lit(_utc_naive(self.reference_date))
        mask = F.lit(True)
        if self.start_timedelta is not None:
            mask = mask & (col >= _shift(ref, self.start_timedelta))
        if self.end_timedelta is not None:
            mask = mask & (col <= _shift(ref, self.end_timedelta))
        return mask
