"""Edge cases beyond the YAML corpus: nested consistency expressions,
far-future timestamps, codec round-trips, scrubber patterns."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark import (
    ConsistencyRule,
    TimelinessStaticRule,
    evaluate_rules,
)
from gchq_data_quality_spark.functions.images import decode_ppm, encode_ppm, psnr
from gchq_data_quality_spark.functions.scrub import Scrubber
from gchq_data_quality_spark.functions.text import (
    char_repetition_ratio,
    repetition_ratio,
    token_count,
)


def test_consistency_over_nested_paths(spark):
    """Backticked nested paths inside expressions route through the flatten
    planner (parity: reference spark_safe_expression.yaml cases)."""
    df = spark.createDataFrame(
        [
            (1, ("A", [10, 20])),
            (2, ("B", [5])),
            (3, ("A", [])),
        ],
        "id int, rec struct<cat:string, amounts:array<int>>",
    )
    rule = ConsistencyRule(
        field="rec.amounts[*]",
        expression={"if": "`rec.cat` == 'A'", "then": "`rec.amounts[*]` >= 10"},
    )
    [result] = evaluate_rules(df, [rule])
    # exploded rows: (A,10) (A,20) (B,5) (A,null); skip_if_null='all' keeps
    # (A,null) since cat is non-null -> evaluated rows 1,2,4; null fails then
    assert result.records_evaluated == 3
    assert result.pass_rate == pytest.approx(2 / 3)


def test_far_future_year_preserved(spark):
    """Year-3025 dates are kept, not nulled (parity:
    rules/utils/datetime_utils.py:55-62 rationale)."""
    df = spark.createDataFrame(
        [("3025-01-01",), ("2024-01-01",), ("not-a-date",)], "d string"
    )
    rule = TimelinessStaticRule(field="d", start_date="2000-01-01", end_date="2030-01-01")
    [result] = evaluate_rules(df, [rule])
    assert result.records_evaluated == 2  # parse failure skipped, 3025 kept
    assert result.pass_rate == pytest.approx(0.5)  # 3025 fails the window


def test_ppm_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    decoded = decode_ppm(encode_ppm(img))
    assert np.array_equal(img, decoded)
    assert psnr(img, decoded) == float("inf")
    noisy = np.clip(decoded.astype(int) + rng.integers(-2, 3, decoded.shape), 0, 255).astype(np.uint8)
    assert psnr(img, noisy) >= 40.0


@pytest.mark.parametrize(
    "text,expected",
    [
        ("contact me at bob@example.com now", "contact me at <EMAIL> now"),
        ("call +1 555-123-4567 today", "call <PHONE> today"),
        ("visit https://example.com/a?b=1 please", "visit <URL> please"),
        ("server at 192.168.0.1 down", "server at <IP> down"),
        ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
        ("that badword1 and BADWORD2 here", "that <TOX> and <TOX> here"),
        ("a perfectly clean sentence", "a perfectly clean sentence"),
    ],
)
def test_scrubber_patterns(spark, text, expected):
    df = spark.createDataFrame([(text,)], "t string")
    out = df.select(Scrubber().apply(F.col("t")).alias("s")).collect()[0]["s"]
    assert out == expected


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("one two three",), ("spam spam spam spam spam spam",), ("aaaaaaaaaa",), ("",)],
        "t string",
    )
    rows = df.select(
        token_count(F.col("t")).alias("tokens"),
        F.round(repetition_ratio(F.col("t")), 3).alias("rep"),
        F.round(char_repetition_ratio(F.col("t")), 3).alias("chrep"),
    ).collect()
    assert rows[0]["tokens"] == 3 and rows[0]["rep"] == 0.0
    assert rows[1]["tokens"] == 6 and rows[1]["rep"] == pytest.approx(0.8, abs=0.01)
    assert rows[2]["chrep"] == pytest.approx(0.9, abs=0.01)
    assert rows[3]["tokens"] == 0


def test_isin_large_membership(spark):
    from gchq_data_quality_spark.functions.membership import isin_large

    df = spark.createDataFrame([("a",), ("b",), (None,), ("z",)], "v string")
    authority = spark.createDataFrame([("a",), ("b",), ("c",)], "allowed string")
    out = {r.v: r.accuracy_pass for r in isin_large(df, "v", authority, "allowed").collect()}
    assert out["a"] is True and out["b"] is True and out["z"] is False
    assert out[None] is None
    inv = {r.v: r.accuracy_pass for r in isin_large(df, "v", authority, "allowed", inverse=True).collect()}
    assert inv["z"] is True and inv["a"] is False


def test_report_json_file_roundtrip(tmp_path, spark):
    """report -> to_json(path) -> from_json -> to_dataframe equality
    (reference models.py:166-188 serialises; from_json closes the loop)."""
    from gchq_data_quality_spark import CompletenessRule
    from gchq_data_quality_spark.engine import evaluate_rules
    from gchq_data_quality_spark.results import DataQualityReport

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id long, x string"
    )
    results = evaluate_rules(
        df, [CompletenessRule(field="x", rule_id="c1")], row_id_col="id"
    )
    report = DataQualityReport(results=results)
    path = tmp_path / "report.json"
    report.to_json(str(path))

    loaded = DataQualityReport.from_json(str(path))
    orig_df = report.to_dataframe().drop(columns=["measurement_time"])
    loaded_df = loaded.to_dataframe().drop(columns=["measurement_time"])
    assert orig_df.to_dict("records") == loaded_df.to_dict("records")
    # and from a raw JSON string too
    again = DataQualityReport.from_json(report.to_json())
    assert len(again.results) == 1
    assert again.results[0].records_failed_sample == report.results[0].records_failed_sample


def test_curation_example_runs_end_to_end():
    """The examples are user-facing documentation — they must keep running
    (an uncovered NTZ-timestamp regression hid in the as-of section for a
    round). Subprocess: the example owns (and stops) its own session.
    Timeout headroom is 7x the measured calm-phase runtime (123 s):
    under pytest the example shares the host with the suite's idle JVM,
    and degraded host phases run 3-4x slow (BASELINE.md drift notes) —
    420 s tripped spuriously in one such phase (r5)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "examples" / "curation_ops_example.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "vocabulary coverage" in proc.stdout
    assert "incremental ingestion" in proc.stdout
