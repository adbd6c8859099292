"""Stateful streaming exact-dedup: keep the FIRST occurrence of each
normalised text fingerprint across micro-batches.

The reference has no streaming surface (SURVEY.md §2.9); this extends the
engine's dedup family (functions/dedup.py) to continuously-arriving data with
``applyInPandasWithState``: the stream is keyed by the 64-bit fingerprint, the
per-key state is a single "already emitted" flag, and every later duplicate is
dropped — exactly the batch ``exact_dedup`` semantics, incrementally.

Scale design:
- state is partitioned by key hash across the state store (one shuffle on the
  fingerprint — the same single shuffle the batch operator pays);
- per-key state is ~1 byte of payload, so 10^9 distinct fingerprints is
  gigabytes of state store, spilled by the HDFS/RocksDB state backend;
- unbounded retention by default (a duplicate a week later is still dropped).
  For bounded state pass ``state_ttl`` (processing-time timeout): keys idle
  longer than the TTL are forgotten and a later duplicate would re-emit —
  the standard state-size/recall trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FP_COL = "__fp"


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    normalise: bool = True,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence-per-fingerprint over a streaming DataFrame.

    Returns a streaming DataFrame with the input schema; write it with
    ``outputMode("append")``. Within a micro-batch the smallest ``id_col``
    wins (deterministic); across batches the earlier batch wins.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from gchq_data_quality_spark.functions.text import fingerprint

    fp = (
        fingerprint(F.col(text_col))
        if normalise
        else F.xxhash64(F.col(text_col))
    )
    keyed = stream_df.withColumn(FP_COL, fp)

    out_schema = T.StructType([f for f in stream_df.schema.fields])
    state_schema = T.StructType([T.StructField("emitted", T.IntegerType())])
    out_cols = [f.name for f in stream_df.schema.fields]

    def dedup_fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        emitted = state.get[0] if state.exists else 0
        # a key's rows can span several Arrow chunks within one micro-batch:
        # track the best (smallest-id) candidate across ALL chunks before
        # emitting, or a larger id from an earlier chunk could win
        best = None
        for pdf in pdf_iter:
            if emitted or pdf.empty:
                continue
            head = pdf.sort_values(id_col).head(1)[out_cols]
            if best is None:
                best = head
            else:
                best = pd.concat([best, head]).sort_values(id_col).head(1)
        if best is not None and not emitted:
            emitted = 1
            yield best
        state.update((emitted,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(FP_COL).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
