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
