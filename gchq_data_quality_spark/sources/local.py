"""LocalRelation-backed small DataFrames.

``spark.createDataFrame(rows)`` parallelizes the rows into an RDD: every
downstream action — even ``collect()`` of six rows — schedules a real job
(~0.2 s on a 32-core local session), and small follow-up aggregations pay
an AQE stage round per shuffle. Rendering the rows as a SQL ``VALUES``
literal instead plans a ``LocalRelation``: ``collect()`` is driver-local
(measured 0.23 -> 0.03 s) and downstream jobs start one stage earlier.

Only for SMALL frames (≤ ``MAX_VALUES_ROWS``): the SQL parser walks every
literal, so huge VALUES strings would trade task overhead for parse time.
Callers with bigger or literal-unfriendly rows fall back to
``createDataFrame`` automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAX_VALUES_ROWS = 5000


def _literal(value, dtype: T.DataType) -> str | None:
    """SQL literal for one cell; None = unsupported (caller falls back)."""
    ddl = dtype.simpleString()
    if value is None:
        return f"CAST(NULL AS {ddl})"
    if isinstance(dtype, T.StringType):
        if not isinstance(value, str):
            return None
        escaped = value.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return f"CAST({value} AS {ddl})"
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            return None
        # repr round-trips the exact double; string->double cast parses it
        # with correct rounding, so the cell is bit-identical to the Python
        # float (a bare decimal literal would parse as DECIMAL instead)
        return f"CAST('{value!r}' AS {ddl})"
    if isinstance(dtype, T.BooleanType):
        if not isinstance(value, bool):
            return None
        return "true" if value else "false"
    return None


def local_values_df(
    spark: SparkSession, rows: list[tuple], schema: str | T.StructType
) -> DataFrame:
    """A small DataFrame planned as a LocalRelation (VALUES literal), with a
    transparent ``createDataFrame`` fallback for empty/large/unsupported
    inputs. Values are rendered exactly (see ``_literal``)."""
    struct = (
        T._parse_datatype_string(schema) if isinstance(schema, str) else schema
    )
    if rows and len(rows) <= MAX_VALUES_ROWS:
        rendered: list[str] = []
        ok = True
        for row in rows:
            cells = []
            for value, field in zip(row, struct.fields):
                lit = _literal(value, field.dataType)
                if lit is None:
                    ok = False
                    break
                cells.append(lit)
            if not ok:
                break
            rendered.append("(" + ", ".join(cells) + ")")
        if ok:
            # IF(TRUE, x, NULL) forces every output field NULLABLE, matching
            # createDataFrame's schema exactly (the driver compares schemas);
            # ConvertToLocalRelation folds the projection back into the
            # LocalRelation, so no job is scheduled for it
            cols = ", ".join(
                f"IF(TRUE, col{i + 1}, NULL) AS `{f.name}`"
                for i, f in enumerate(struct.fields)
            )
            return spark.sql(
                f"SELECT {cols} FROM (VALUES {', '.join(rendered)})"
            )
    return spark.createDataFrame(rows, struct)
