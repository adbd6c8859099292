"""Column-level coercion and null-normalisation helpers.

These reproduce, as Catalyst expressions, the per-partition pandas coercions
the reference applies before mask computation:

- sentinel na_values -> NULL       (rules/utils/rules_utils.py:57-78)
- NaN normalised to NULL           (tests/spark/conftest.py:106-133)
- pd.to_numeric(errors="coerce")   (rules/validity.py:171-173) -> try_cast double
- UTC datetime coercion            (rules/utils/datetime_utils.py:24-69)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def is_floating(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.DoubleType, T.FloatType))


def nullify(col: Column, dtype: T.DataType | None, na_values: Any = None) -> Column:
    """Return ``col`` with NaN and any declared sentinel values turned to NULL.

    Spark treats NaN and NULL as distinct; the reference's pandas semantics
    treat both as missing, so we normalise NaN -> NULL whenever the column is
    floating point. ``na_values`` may be a scalar or a list (mixed types are
    fine — Spark inserts implicit casts; incomparable values simply never
    match).
    """
    null_cond = col.isNull()
    if dtype is None or is_floating(dtype):
        null_cond = null_cond | F.isnan(col)
    if na_values is not None:
        values = na_values if isinstance(na_values, list) else [na_values]
        values = [v for v in values if v is not None]
        if values:
            null_cond = null_cond | col.isin(values)
    return F.when(null_cond, F.lit(None)).otherwise(col)


def to_numeric(col: Column, dtype: T.DataType) -> tuple[Column, T.DataType]:
    """``pd.to_numeric(errors='coerce')`` equivalent: unparseable -> NULL.

    Crucially the reference test corpus pins that coercion failures are
    SKIPPED, not failed (tests/data/validity_numerical_range.yaml:57-66) —
    try_cast gives exactly that (NULL rows fall out of the evaluated mask).
    """
    if isinstance(dtype, T.NumericType):
        return col.cast("double"), T.DoubleType()
    if isinstance(dtype, T.BooleanType):
        return col.cast("double"), T.DoubleType()
    return col.try_cast("double"), T.DoubleType()


def to_string_preserving_null(col: Column, dtype: T.DataType) -> tuple[Column, T.DataType]:
    """astype(str) that keeps NULL as NULL (rules/validity.py:85-87).

    Spark's cast-to-string already propagates NULL; booleans need lowering to
    match pandas' "True"/"False" rendering only if compared textually — the
    regex rules in the corpus never do, so a plain cast suffices. Floats that
    are integral render as "1.0" in pandas and "1.0" in Spark alike.
    """
    if isinstance(dtype, T.StringType):
        return col, dtype
    if isinstance(dtype, T.BooleanType):
        # pandas str(True) == "True"; Spark cast gives "true"
        out = F.when(col, F.lit("True")).when(~col, F.lit("False"))
        return out, T.StringType()
    return col.cast("string"), T.StringType()


# Date-ish string formats that pandas' parser accepts but Spark's default
# timestamp cast does not (or interprets differently when dayfirst=True).
_DAYFIRST_FORMATS = [
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
    "dd/MM/yyyy",
    "dd-MM-yyyy HH:mm:ss",
    "dd-MM-yyyy",
]
_MONTHFIRST_FORMATS = [
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy HH:mm",
    "MM/dd/yyyy",
    "MM-dd-yyyy HH:mm:ss",
    "MM-dd-yyyy",
]


def to_utc_timestamp(
    col: Column, dtype: T.DataType, dayfirst: bool = False
) -> tuple[Column, T.DataType]:
    """Coerce a column to UTC timestamps, unparseable -> NULL.

    Assumes ``spark.sql.session.timeZone=UTC`` (the engine session helper
    pins it, matching the reference test session tests/spark/conftest.py:174).
    Naive strings are read as UTC; offset-aware strings are converted; integers
    are nanoseconds since the epoch (pandas to_datetime convention,
    rules/utils/datetime_utils.py:30-34). Spark timestamps span ±290k years so
    the reference's out-of-bounds fallback (year 3025 preserved) is free.
    """
    if isinstance(dtype, T.TimestampType):
        return col, dtype
    if isinstance(dtype, (T.DateType, T.TimestampNTZType)):
        return col.cast("timestamp"), T.TimestampType()
    if isinstance(dtype, T.NumericType):
        # nanoseconds since epoch -> microseconds
        return F.timestamp_micros((col / F.lit(1000)).cast("long")), T.TimestampType()
    if not isinstance(dtype, T.StringType):
        col = col.cast("string")
    formats = _DAYFIRST_FORMATS if dayfirst else _MONTHFIRST_FORMATS
    candidates = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in formats]
    # ISO-8601 / default parser last for dayfirst=False order preference:
    # explicit slash formats win only when the default cast fails.
    parsed = F.coalesce(col.try_cast("timestamp"), *candidates) if not dayfirst else F.coalesce(
        *candidates, col.try_cast("timestamp")
    )
    return parsed, T.TimestampType()
