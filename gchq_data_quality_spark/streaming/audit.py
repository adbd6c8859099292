"""Incremental (Structured Streaming) rule auditing.

The reference has NO streaming surface (SURVEY.md §2.9) — this is the
engine's extension for continuously-arriving data. Because every rule metric
is a sum of conditional counts, the batch audit translates directly to a
streaming aggregation:

    readStream -> compile rules to (evaluated, passing) Columns ->
    groupBy(window(ts)) .agg(sum(...)) with a watermark -> sink in
    update/append mode

Late rows inside the watermark update their window's counts; pass_rate is
recomputed from the summed counts downstream (never averaged across
batches — the same partial/final algebra Catalyst uses in batch mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gchq_data_quality_spark.operators.base import BaseRule


def streaming_audit(
    stream_df: DataFrame,
    rules: list[BaseRule],
    event_time_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    slide_duration: str | None = None,
) -> DataFrame:
    """Windowed per-rule counts over a streaming DataFrame.

    Returns a streaming DataFrame with one row per (window, rule): write it
    with ``.writeStream.outputMode("update")`` (or append once the watermark
    closes windows). Flat columns only — nested flatten is a batch feature.

    ``slide_duration`` < ``window_duration`` makes the windows SLIDING —
    each row lands in width/slide overlapping windows (smoothed trend
    dashboards); the default (None) keeps tumbling windows.
    """
    dtypes = {f.name: f.dataType for f in stream_df.schema.fields}
    compiled = [r.compile(F.col, dtypes.__getitem__) for r in rules]

    aggs = []
    for i, cr in enumerate(compiled):
        if cr.is_global:
            raise ValueError(
                "UniquenessRule needs global state and is not supported in "
                "streaming audits (use approx_count_distinct offline)"
            )
        aggs.append(F.sum(cr.evaluated.cast("long")).alias(f"evaluated_{i}"))
        aggs.append(F.sum(cr.passing_filled().cast("long")).alias(f"passing_{i}"))

    win = (
        F.window(F.col(event_time_col), window_duration, slide_duration)
        if slide_duration is not None
        else F.window(F.col(event_time_col), window_duration)
    )
    windowed = (
        stream_df.withWatermark(event_time_col, watermark)
        .groupBy(win)
        .agg(*aggs)
    )

    # unpivot to one row per (window, rule)
    structs = F.array(
        *[
            F.struct(
                F.lit(cr.rule.rule_id or f"rule_{i}").alias("rule_id"),
                F.col(f"evaluated_{i}").alias("records_evaluated"),
                F.col(f"passing_{i}").alias("records_passing"),
            )
            for i, cr in enumerate(compiled)
        ]
    )
    return (
        windowed.select("window", F.explode(structs).alias("m"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("m.rule_id").alias("rule_id"),
            F.col("m.records_evaluated").alias("records_evaluated"),
            F.col("m.records_passing").alias("records_passing"),
            F.when(
                F.col("m.records_evaluated") > 0,
                F.col("m.records_passing") / F.col("m.records_evaluated"),
            ).alias("pass_rate"),
        )
    )
