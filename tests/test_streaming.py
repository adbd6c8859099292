"""Streaming audit: windowed rule counts over a memory-source stream."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from gchq_data_quality_spark import CompletenessRule, ValidityNumericalRangeRule
from gchq_data_quality_spark.streaming.audit import streaming_audit


def test_streaming_audit_counts(spark, tmp_path):
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 10), "a", 5.0),
        (dt.datetime(2024, 1, 1, 0, 0, 20), None, 50.0),
        (dt.datetime(2024, 1, 1, 0, 1, 10), "c", 500.0),
        (dt.datetime(2024, 1, 1, 0, 1, 20), "d", -1.0),
    ]
    src = tmp_path / "stream_src"
    spark.createDataFrame(rows, "ts timestamp, name string, value double").write.parquet(
        str(src)
    )
    stream = spark.readStream.schema("ts timestamp, name string, value double").parquet(
        str(src)
    )
    rules = [
        CompletenessRule(field="name", rule_id="name_ok"),
        ValidityNumericalRangeRule(field="value", min_value=0, max_value=100, rule_id="value_ok"),
    ]
    audited = streaming_audit(stream, rules, "ts", "1 minute", "2 minutes")

    query = (
        audited.writeStream.format("memory")
        .queryName("audit_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    result = {
        (r.window_start.minute, r.rule_id): (r.records_evaluated, r.records_passing)
        for r in spark.sql("select * from audit_sink").collect()
    }
    assert result[(0, "name_ok")] == (2, 1)
    assert result[(0, "value_ok")] == (2, 2)
    assert result[(1, "name_ok")] == (2, 2)
    assert result[(1, "value_ok")] == (2, 0)  # 500 over max, -1 under min


def test_uniqueness_rejected_in_streaming(spark, tmp_path):
    from gchq_data_quality_spark import UniquenessRule

    src = tmp_path / "s2"
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1)], "ts timestamp, id int"
    ).write.parquet(str(src))
    stream = spark.readStream.schema("ts timestamp, id int").parquet(str(src))
    with pytest.raises(ValueError, match="global state"):
        streaming_audit(stream, [UniquenessRule(field="id")], "ts")


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """First occurrence of each normalised text survives; duplicates in the
    SAME batch and in LATER batches are dropped (per-key state)."""
    import os
    import time

    from gchq_data_quality_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    schema = "doc_id long, text string"
    batch1 = [(0, "the quick brown fox"), (1, "unique text one"),
              (2, "THE  quick   brown fox")]  # 2 normalises to dup of 0
    batch2 = [(3, "the quick brown fox"),     # cross-batch dup of 0
              (4, "unique text two")]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # file source orders batches by modification time
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(str(src / "b2"))
    now = time.time()
    for i, d in enumerate(["b1", "b2"]):
        for f in (src / d).iterdir():
            os.utime(f, (now + i, now + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    deduped = streaming_exact_dedup(stream, "text", "doc_id")
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {r.doc_id: r.text for r in spark.sql("select * from dedup_sink").collect()}
    assert 0 in got          # first occurrence of the fox text
    assert 2 not in got      # same-batch normalised duplicate
    assert 3 not in got      # cross-batch duplicate (state remembered it)
    assert 1 in got and 4 in got
    assert len(got) == 3


def test_streaming_audit_sliding_windows(spark, tmp_path):
    """slide < width: every row lands in width/slide overlapping windows,
    so the per-window counts overlap-and-sum accordingly."""
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 30), "a"),
        (dt.datetime(2024, 1, 1, 0, 1, 30), None),
    ]
    src = tmp_path / "stream_slide"
    spark.createDataFrame(rows, "ts timestamp, name string").write.parquet(str(src))
    stream = spark.readStream.schema("ts timestamp, name string").parquet(str(src))
    audited = streaming_audit(
        stream,
        [CompletenessRule(field="name", rule_id="name_ok")],
        "ts",
        window_duration="2 minutes",
        watermark="4 minutes",
        slide_duration="1 minute",
    )
    query = (
        audited.writeStream.format("memory")
        .queryName("audit_slide_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    result = {
        r.window_start.minute: (r.records_evaluated, r.records_passing)
        for r in spark.sql("select * from audit_slide_sink").collect()
    }
    # row@0:30 -> windows starting 23:59 and 00:00; row@1:30 -> 00:01 and 00:00
    assert result[0] == (2, 1)   # both rows share the 00:00-00:02 window
    assert result[59] == (1, 1)  # 23:59-00:01 holds only the first row
    assert result[1] == (1, 0)   # 00:01-00:03 holds only the null row
