"""Large-authority-list membership: the join path behind AccuracyRule.

``isin`` compiles to an in-memory hash set per task — ideal up to ~10^4
values. Beyond that (allow/deny lists of millions of entries) the right
physical plan is a broadcast semi/anti join; this module provides it with
the same rule semantics (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def isin_large(
    df: DataFrame,
    field: str,
    values_df: DataFrame,
    value_col: str,
    inverse: bool = False,
    flag_col: str = "accuracy_pass",
) -> DataFrame:
    """Add a boolean flag: field value present (absent if inverse) in the list.

    Implemented as a broadcast LEFT join + null-check so non-matching rows
    keep flowing (a semi join would drop them — rules must see every row).
    """
    marks = values_df.select(
        F.col(value_col).alias("__authority_value"), F.lit(True).alias("__hit")
    ).distinct()
    joined = df.join(
        F.broadcast(marks),
        df[field] == F.col("__authority_value"),
        "left",
    ).drop("__authority_value")
    hit: Column = F.coalesce(F.col("__hit"), F.lit(False))
    flag = ~hit if inverse else hit
    return joined.withColumn(
        flag_col, F.when(df[field].isNull(), F.lit(None)).otherwise(flag)
    ).drop("__hit")
