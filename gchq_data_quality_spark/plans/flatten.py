"""Nested-path flattening: compile ``a.b[*].c`` paths into a Spark plan.

Path language (parity: reference spark/dataframe_operations.py:37-91 and the
golden outputs in tests/data/flatten_spark.yaml:44-99):

- ``a.b``      struct field access
- ``a[*]``     explode the array — one row per element, EMPTY/NULL arrays keep
               the row with a NULL element (explode_outer semantics)
- ``a[]``      first non-null element of the array (no row fan-out)

Flat output names: ``.`` -> ``_``, ``[*]`` -> ``_all``, ``[]`` -> ``_first``
(parity: spark/utils/rules_utils.py:44-66), e.g.
``customers.pets[*].appointments[].date`` -> ``customers_pets_all_appointments_first_date``.

This is a *planner*: it emits a chain of ``select`` / ``explode_outer`` /
higher-order ``filter``+``get`` expressions and lets Catalyst prune and push
down around them. Nothing here runs per-row Python.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NOTATION_RE = re.compile(r"^(.*?)(\[\*\]|\[\])?$")


def split_notation(segment: str) -> tuple[str, str]:
    """``'pets[*]' -> ('pets', '[*]')``; ``'name' -> ('name', '')``."""
    if segment.endswith("[*]"):
        return segment[:-3], "[*]"
    if segment.endswith("[]"):
        return segment[:-2], "[]"
    return segment, ""


def is_nested(path: str) -> bool:
    return "." in path or path.endswith("[*]") or path.endswith("[]") or "[*]." in path or "[]." in path


def safe_name(path: str) -> str:
    """Spark-safe flat column name for a nested path."""
    return (
        path.replace("[*]", "_all").replace("[]", "_first").replace(".", "_").strip("_")
    )


def _array_prefixes(paths: list[str]) -> list[str]:
    """Every path prefix that ends in array notation, shallow -> deep."""
    prefixes: set[str] = set()
    for path in paths:
        parts = path.split(".")
        for i, part in enumerate(parts):
            if split_notation(part)[1]:
                prefixes.add(".".join(parts[: i + 1]))
    return sorted(prefixes, key=lambda p: (p.count("."), p))


def _check_consistent_notation(prefixes: list[str]) -> None:
    seen: dict[str, str] = {}
    for prefix in prefixes:
        base, notation = split_notation(prefix)
        if seen.setdefault(base, notation) != notation:
            raise ValueError(
                f"Invalid mix of '[*]' and '[]' at same nesting level: {prefixes}"
            )


def validate_path(schema: T.StructType, path: str) -> None:
    """Walk the schema along ``path``; raise ValueError on any mismatch."""
    current: T.DataType = schema
    segments = path.split(".")
    for idx, segment in enumerate(segments):
        base, notation = split_notation(segment)
        if not isinstance(current, T.StructType):
            raise ValueError(
                f"Cannot access field '{base}' of non-struct type in path '{path}'."
            )
        if base not in current.fieldNames():
            raise ValueError(
                f"Column '{base}' in path '{path}' not found. "
                f"Available fields: {current.fieldNames()}"
            )
        field_type = current[base].dataType
        if notation:
            if not isinstance(field_type, T.ArrayType):
                raise ValueError(f"Column '{base}' in path '{path}' is not an array.")
            current = field_type.elementType
        else:
            if isinstance(field_type, T.ArrayType):
                raise ValueError(
                    f"Column '{base}' in path '{path}' is an array and must end "
                    "with '[*]' or '[]'."
                )
            current = field_type
        if not isinstance(current, (T.StructType,)) and idx < len(segments) - 1:
            if not isinstance(current, T.StructType):
                # deeper segments remain but the type is scalar
                raise ValueError(
                    f"Path '{path}' descends past scalar field '{base}'."
                )


def _resolve_ref(path: str, materialised: set[str]) -> str:
    """Column reference for ``path`` given already-materialised array prefixes.

    Finds the deepest array prefix of ``path`` already materialised as a flat
    column, and rewrites the path as ``<safe_prefix>.<remainder>`` (struct
    access on the exploded element). Notation on the final segment is dropped
    (the caller applies the array operation itself).
    """
    parts = path.split(".")
    best_idx, best_prefix = -1, None
    for i in range(len(parts) - 1, -1, -1):
        prefix = ".".join(parts[: i + 1])
        if prefix in materialised and prefix != path:
            best_idx, best_prefix = i, prefix
            break
    tail = parts[best_idx + 1 :]
    if tail:
        tail[-1] = split_notation(tail[-1])[0]
    if best_prefix is None:
        return ".".join(tail)
    return ".".join([safe_name(best_prefix)] + tail)


def flatten(
    df: DataFrame, paths: list[str], keep_cols: list[str] | None = None
) -> tuple[DataFrame, dict[str, str]]:
    """Flatten the requested nested ``paths``; return (df, name mapping).

    The result contains ``keep_cols`` (untouched top-level columns, e.g. a row
    id for diagnostics) followed by one flat column per requested path. The
    mapping sends each original path to its flat column name. If nothing is
    nested the input df is returned unchanged (short-circuit parity:
    spark/dataframe_operations.py:69-71).
    """
    keep_cols = keep_cols or []
    mapping = {p: (safe_name(p) if is_nested(p) else p) for p in paths}
    if not any(is_nested(p) for p in paths):
        return df, mapping

    for path in paths:
        validate_path(df.schema, path)

    prefixes = _array_prefixes(paths)
    _check_consistent_notation(prefixes)

    materialised: set[str] = set()
    for prefix in prefixes:
        ref = _resolve_ref(prefix, materialised)
        alias = safe_name(prefix)
        notation = split_notation(prefix.split(".")[-1])[1]
        if notation == "[*]":
            expr = F.explode_outer(F.col(ref))
        else:  # '[]' -> first non-null element (higher-order filter + get)
            expr = F.expr(f"get(filter({ref}, x -> x IS NOT NULL), 0)")
        existing = [c for c in df.columns if c != alias]
        df = df.select(*existing, expr.alias(alias))
        materialised.add(prefix)

    # Final scalar extraction for every requested path.
    out_cols = list(keep_cols)
    for path in paths:
        flat = mapping[path]
        if path in materialised:
            out_cols.append(flat)
        elif is_nested(path):
            ref = _resolve_ref(path, materialised)
            df = df.withColumn(flat, F.col(ref))
            out_cols.append(flat)
        else:
            out_cols.append(path)
    return df.select(*out_cols), mapping


def flatten_spark(df: DataFrame, flatten_cols: list[str]) -> DataFrame:
    """Reference-signature wrapper (spark/dataframe_operations.py:37-91, used
    directly in the reference's PySpark tutorial): flatten the requested
    nested paths and return ONLY those columns under their Spark-safe names.
    Returns the input unchanged when nothing is nested (same short-circuit).
    """
    if not any(is_nested(p) for p in flatten_cols):
        return df
    flat, mapping = flatten(df, flatten_cols)
    return flat.select(
        *[F.col(mapping[p]).alias(safe_name(p)) for p in flatten_cols]
    )


def explosion_signature(paths: list[str]) -> frozenset[str]:
    """The set of ``[*]`` prefixes a rule's columns require.

    Rules with the same signature see the same row multiplicity, so the engine
    can evaluate them in one shared pass; rules with different signatures need
    separate flattened views (each ``[*]`` changes the unit of account).
    """
    return frozenset(
        p for p in _array_prefixes(paths) if split_notation(p.split(".")[-1])[1] == "[*]"
    )
