"""Result models: one row per rule evaluation, plus a report wrapper.

Parity: reference results/models.py:52-298 (DataQualityResult /
DataQualityReport). The reference additionally ships a hand-rolled
partial->final merge subsystem (results/models.py:320-413, results/utils.py)
to combine per-partition results coming back from mapInPandas; our engine
deletes that entirely — Catalyst's HashAggregate(partial) -> Exchange ->
HashAggregate(final) does the same merge inside one job, and results are
computed once, globally.

``records_failed_ids``: the reference emits positional indices in pandas mode
and explicitly drops them in Spark mode as unreliable
(spark/utils/results_utils.py:56, docs/python-pyspark.md:283). Our engine
emits stable row identifiers instead whenever the caller names an id column
(strictly better: deterministic under shuffle).
"""

from __future__ import annotations

import json
import warnings
from datetime import UTC, datetime
from typing import Any

import pandas as pd
from pydantic import Field, field_serializer, field_validator

from gchq_data_quality_spark.globals import SampleConfig
from gchq_data_quality_spark.models import (
    DataQualityBaseModel,
    DataQualityDimension,
    UTCDateTimeStrict,
)


def calculate_pass_rate(records_passing: int, records_evaluated: int) -> float | None:
    """passing/evaluated; None when nothing was evaluated
    (parity: rules/utils/rules_utils.py:23-37)."""
    if records_evaluated > 0:
        return records_passing / records_evaluated
    return None


def format_records_failed_sample(
    values: list[dict] | None, n_items: int | None = None
) -> list[dict] | None:
    """Truncate a failed-record sample to ``n_items``; None when empty
    (golden cases: reference tests/data/format_records_failed_sample.yaml —
    duplicates are preserved, de-duplication happens upstream)."""
    if not values:
        return None
    limit = SampleConfig.RECORDS_FAILED_SAMPLE_SIZE if n_items is None else n_items
    return values[:limit]


def get_records_failed_ids(
    failed_mask: list, index: list | None = None, max_samples: int = 10
) -> list:
    """Row labels where ``failed_mask`` is True, first ``max_samples``
    (parity: reference rules/utils/rules_utils.py:81-117, golden cases
    get_records_failed_ids.yaml). ``index`` defaults to positional row
    numbers — the reference's pandas RangeIndex; Spark mode replaces
    positional ids with stable ids upstream (engine.py), so this util
    exists for report/API parity, not the hot path. Raises ValueError on a
    mask/index length mismatch like the reference's reindex contract."""
    if index is None:
        index = list(range(len(failed_mask)))
    if len(index) != len(failed_mask):
        raise ValueError(
            f"failed_mask length {len(failed_mask)} != index length {len(index)}"
        )
    out = [i for i, m in zip(index, failed_mask, strict=True) if bool(m)]
    return out[:max_samples]


def records_failed_ids_are_int(records_failed_ids: list) -> bool:
    """True iff every failed-record id is an integer (parity: reference
    results/utils.py:128-146; golden cases records_failed_ids_are_int.yaml —
    vacuously true for []). Gates the all-or-nothing shift below."""
    return all(isinstance(i, int) for i in records_failed_ids)


def shift_records_failed_ids(records_failed_ids: list, shift: int = 0) -> list:
    """Add ``shift`` to every id IF the ids are all integers, else return the
    list untouched (parity: reference results/utils.py:148-176, golden cases
    shift_records_failed_ids.yaml — a single non-int disables the shift for
    the whole list, it is not applied per-element)."""
    if records_failed_ids and records_failed_ids_are_int(records_failed_ids):
        return [i + shift for i in records_failed_ids]
    return records_failed_ids


def aggregate_records_failed_samples(
    records_failed_sample_series, limit: int | None = None
) -> list[dict] | None:
    """Concatenate per-partition sample lists (None / empty skipped) into one
    bounded list (parity: reference results/utils.py:80-103, golden cases
    tests/data/aggregate_records_failed_samples.yaml). Our engine computes
    samples globally in one job so it never *needs* this merge — kept for API
    parity with callers combining externally-partitioned reports."""
    merged = [
        item
        for sample in records_failed_sample_series
        if isinstance(sample, list)
        for item in sample
    ]
    if not merged:
        return None
    cap = SampleConfig.RECORDS_FAILED_SAMPLE_SIZE if limit is None else limit
    return merged[:cap]


def _jsonable(value: Any) -> Any:
    if value is None or (not isinstance(value, (list, dict, str)) and pd.isna(value)):
        return None
    if isinstance(value, (pd.Timestamp, datetime)):
        return value.isoformat()
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_jsonable(v) for v in value]
    if hasattr(value, "item"):  # numpy scalars
        return value.item()
    return value


class DataQualityResult(DataQualityBaseModel):
    """Outcome of one rule applied to one field."""

    dataset_name: float | str | int | None = Field(default=None)
    dataset_id: float | str | int | None = Field(default=None)
    measurement_sample: str | None = Field(default=None)
    lifecycle_stage: Any | None = Field(default=None)
    measurement_time: UTCDateTimeStrict = Field(
        default_factory=lambda: datetime.now(UTC)
    )

    field: str = Field(...)
    data_quality_dimension: DataQualityDimension = Field(...)
    records_evaluated: int | None = Field(default=None)
    pass_rate: float | None = Field(default=None, ge=0, le=1)
    rule_id: Any | None = Field(default=None)
    rule_description: Any = Field(default=None)
    rule_data: str = Field(
        description="JSON dump of the rule so it can be reconstructed"
    )
    records_failed_ids: list | None = Field(default=None)
    records_failed_sample: list[dict] | None = Field(default=None)

    @field_validator("pass_rate", mode="before")
    @classmethod
    def _nan_to_none(cls, v):
        if v is not None and pd.isna(v):
            return None
        return v

    @field_validator("records_failed_sample", "records_failed_ids", mode="before")
    @classmethod
    def _maybe_json_load(cls, v, info):
        if v is None or isinstance(v, list):
            return v
        try:
            return json.loads(v)
        except (json.JSONDecodeError, TypeError):
            warnings.warn(
                f"Failed to decode field '{info.field_name}' as JSON. Returning None.",
                stacklevel=2,
            )
            return None

    @field_serializer("records_failed_sample", when_used="json")
    def _serialize_sample(self, value):
        return None if value is None else _jsonable(value)

    def _set_records_failed_sample(self, records_failed: list[dict] | None) -> None:
        if records_failed is None:
            self.records_failed_sample = None
        else:
            limit = SampleConfig.RECORDS_FAILED_SAMPLE_SIZE
            self.records_failed_sample = records_failed[:limit]


class DataQualityReport(DataQualityBaseModel):
    """A list of DataQualityResults with tabular/JSON export."""

    results: list[DataQualityResult] = Field(default_factory=list)

    def to_dataframe(
        self,
        decimals: int = 4,
        measurement_time_format: str | None = None,
        records_failed_ids_shift: int = 0,
    ) -> pd.DataFrame:
        """Tabular report (parity: reference results/models.py:254-298).

        ``measurement_time_format``: optional strftime format applied to the
        measurement_time column. ``records_failed_ids_shift``: added to every
        integer failed-record id (the reference offers this to align pandas
        row positions with e.g. spreadsheet rows; our ids are stable row ids,
        so the shift only applies when they are integers).
        """
        rows = []
        for result in self.results:
            row = result.to_dict()
            if result.pass_rate is not None:
                row["pass_rate"] = round(result.pass_rate, decimals)
            if measurement_time_format and row.get("measurement_time") is not None:
                ts = pd.Timestamp(row["measurement_time"])
                row["measurement_time"] = ts.strftime(measurement_time_format)
            if records_failed_ids_shift and row.get("records_failed_ids"):
                row["records_failed_ids"] = shift_records_failed_ids(
                    row["records_failed_ids"], records_failed_ids_shift
                )
            rows.append(row)
        return pd.DataFrame(rows)

    @classmethod
    def from_json(cls, source: str) -> "DataQualityReport":
        """Load a report from a JSON file path or a JSON string — the inverse
        of ``to_json(path)`` (reference models.py:166-188 only serialises;
        the loader closes the round-trip for reports persisted outside a
        table)."""
        import os

        if os.path.exists(source):
            with open(source) as f:
                source = f.read()
        return cls(**json.loads(source))

    @classmethod
    def from_dataframe(cls, df: pd.DataFrame) -> "DataQualityReport":
        records = df.to_dict("records")
        cleaned = [
            {
                k: (None if not isinstance(v, (list, dict, str)) and pd.isna(v) else v)
                for k, v in rec.items()
            }
            for rec in records
        ]
        return cls(results=[DataQualityResult(**rec) for rec in cleaned])
