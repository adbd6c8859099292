"""The spark-submit job end-to-end (in-process): default mode writes all
rows + flags and audits the written output; --keep-only writes only kept
rows but audits PRE-filter flags (ADVICE r1: auditing the filtered output
read ~1.0 pass rates and measured nothing)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "jobs"))

import quality_filter_job  # noqa: E402


def _run(tmp_path, extra):
    out = tmp_path / "out"
    audit = tmp_path / "audit"
    manifest = tmp_path / "m.json"
    quality_filter_job.main(
        [
            "--synthetic", "400",
            "--output", str(out),
            "--audit", str(audit),
            "--manifest", str(manifest),
            "--n-buckets", "4",
            "--buckets-per-batch", "2",
            *extra,
        ]
    )
    return out, audit, manifest


def test_job_default_writes_flags_and_audit(spark, tmp_path, capsys):
    out, audit, _ = _run(tmp_path, [])
    written = spark.read.parquet(str(out))
    assert written.count() == 400
    assert "keep" in written.columns and "caption_scrubbed" in written.columns
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_written"] == 400

    audit_rows = {r.rule_id: r for r in spark.read.parquet(str(audit)).collect()}
    assert audit_rows["caption_present"].records_evaluated == 400


def test_job_keep_only_audits_prefilter_flags(spark, tmp_path, capsys):
    out, audit, _ = _run(tmp_path, ["--keep-only"])
    written = spark.read.parquet(str(out))
    kept = written.count()
    assert 0 < kept < 400  # the synthetic table plants defects
    assert written.filter("NOT keep").count() == 0

    audit_rows = {r.rule_id: r for r in spark.read.parquet(str(audit)).collect()}
    # the audit must measure INPUT quality: every rule saw all 400 rows'
    # flags, and at least one rule has a sub-1.0 pass rate
    assert audit_rows["caption_present"].records_evaluated == 400
    assert any(
        r.pass_rate is not None and r.pass_rate < 1.0 for r in audit_rows.values()
    ), {k: v.pass_rate for k, v in audit_rows.items()}
    # kept/total in the sample reflects the pre-filter population
    assert f"total=400" in audit_rows["caption_present"].measurement_sample
    assert f"kept={kept}" in audit_rows["caption_present"].measurement_sample


def test_job_keep_only_resume_skips_everything(spark, tmp_path, capsys):
    out, audit, manifest = _run(tmp_path, ["--keep-only"])
    first_audit = spark.read.parquet(str(audit)).count()
    # resubmit with the same manifest: nothing reprocessed, audit untouched
    quality_filter_job.main(
        [
            "--synthetic", "400",
            "--output", str(out),
            "--audit", str(audit),
            "--manifest", str(manifest),
            "--n-buckets", "4",
            "--buckets-per-batch", "2",
            "--keep-only",
        ]
    )
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["buckets_run"] == 0 and summary["buckets_skipped"] == 4
    assert spark.read.parquet(str(audit)).count() == first_audit
