"""Core shared models: DAMA dimension enum, UTC datetime coercion, base model.

Parity notes (citations into /root/reference):
- DamaFramework enum with case-coercing ``_missing_``: src/gchq_data_quality/models.py:28-67
- UTCDateTime annotated type (everything coerced to UTC; date-only strings are
  midnight UTC): src/gchq_data_quality/models.py:75-137 and
  src/gchq_data_quality/rules/utils/datetime_utils.py:24-69
- DataQualityBaseModel.to_dict/to_json: src/gchq_data_quality/models.py:141-188
"""

from __future__ import annotations

from datetime import UTC, datetime
from enum import Enum
from typing import Annotated

import pandas as pd
from pydantic import BaseModel, BeforeValidator, PlainSerializer, ValidationInfo


class DamaFramework(str, Enum):
    """The six DAMA data-quality dimensions. Accepts any string case."""

    Uniqueness = "Uniqueness"
    Completeness = "Completeness"
    Validity = "Validity"
    Consistency = "Consistency"
    Accuracy = "Accuracy"
    Timeliness = "Timeliness"

    @classmethod
    def _missing_(cls, value: object) -> DamaFramework | None:
        if isinstance(value, str):
            for member in cls:
                if member.value == value.title():
                    return member
        return None


DataQualityDimension = Annotated[DamaFramework, PlainSerializer(lambda x: x.value)]


def parse_utc_datetime(
    value: str | datetime | pd.Timestamp | int | float | None,
    dayfirst: bool = False,
) -> datetime | None:
    """Parse anything date-like into a tz-aware UTC ``datetime``.

    Semantics match the reference's ``to_utc_datetime``
    (rules/utils/datetime_utils.py:24-69): naive inputs are assumed UTC,
    date-only strings become midnight UTC, integers are nanoseconds since
    epoch, and unparseable values raise (at config time we want hard errors,
    matching models.py:100-104 in the reference).
    """
    if value is None:
        return None
    ts = pd.to_datetime(value, dayfirst=dayfirst, utc=True, errors="raise")
    if pd.isna(ts):
        raise ValueError(f"Invalid date value: {value!r}")
    return ts.to_pydatetime()


def _validate_date(value, info: ValidationInfo) -> datetime | None:
    if value is None or (not isinstance(value, (list, dict)) and pd.isna(value)):
        return None
    dayfirst = bool(info.data.get("dayfirst", False)) if info.data else False
    return parse_utc_datetime(value, dayfirst=dayfirst)


def _set_now_if_none(value):
    return datetime.now(UTC) if value is None else value


def _iso_or_none(value) -> str | None:
    if value is None or pd.isnull(value):
        return None
    return value.isoformat()


UTCDateTime = Annotated[
    datetime | None,
    BeforeValidator(_validate_date),
    PlainSerializer(_iso_or_none, when_used="json"),
]

UTCDateTimeStrict = Annotated[
    datetime,
    BeforeValidator(_validate_date),
    BeforeValidator(_set_now_if_none),
    PlainSerializer(lambda v: v.isoformat(), when_used="json"),
]


class DataQualityBaseModel(BaseModel):
    """Base model giving every config/result object dict + JSON export."""

    def to_dict(self) -> dict:
        return self.model_dump(mode="json")

    def to_json(self, path: str | None = None) -> str:
        json_string = self.model_dump_json(indent=2)
        if path:
            with open(path, "w") as f:
                f.write(json_string)
        return json_string
