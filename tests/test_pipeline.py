"""Graft pipeline verification (the BASELINE.json acceptance criteria):

- keep/drop F1 >= 0.99 vs generated labels
- scrubbed caption exact equality per row
- image passthrough: decoded pixels allclose (PSNR = inf for lossless PPM)
- audit rows per rule with correct pass rates
- checkpointed run resumes per-partition without double-counting
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.images import decode_ppm, psnr
from gchq_data_quality_spark.functions.langid import train_langid
from gchq_data_quality_spark.functions.perplexity import train_perplexity
from gchq_data_quality_spark.pipeline import QualityFilterConfig, QualityFilterPipeline
from gchq_data_quality_spark.sources.checkpoint import run_checkpointed
from gchq_data_quality_spark.sources.synthetic import (
    LANGUAGES,
    generate_images_df,
    generate_rows,
    training_corpus,
)

N_ROWS = 1500


@pytest.fixture(scope="module")
def models():
    texts, labels = training_corpus()
    return train_langid(texts, labels), train_perplexity(texts)


@pytest.fixture(scope="module")
def annotated(spark, models):
    langid_model, ppl_model = models
    df = generate_images_df(spark, N_ROWS)
    pipe = QualityFilterPipeline(
        QualityFilterConfig(allowed_langs=LANGUAGES), langid_model, ppl_model
    )
    out, report = pipe.run(df)
    out = out.cache()
    return out, report


def test_keep_drop_f1(annotated):
    out, _ = annotated
    tp = out.filter("keep and expected_keep").count()
    fp = out.filter("keep and not expected_keep").count()
    fn = out.filter("not keep and expected_keep").count()
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} below target (p={precision}, r={recall})"


def test_language_id_accuracy(annotated):
    out, _ = annotated
    labelled = out.filter(F.col("expected_lang").isNotNull())
    total = labelled.count()
    correct = labelled.filter("lang = expected_lang").count()
    assert correct / total >= 0.99


def test_scrubbed_caption_equality(annotated):
    out, _ = annotated
    mismatches = out.filter(
        ~(
            (F.col("caption_scrubbed") == F.col("expected_scrubbed"))
            | (F.col("caption_scrubbed").isNull() & F.col("expected_scrubbed").isNull())
        )
    ).count()
    assert mismatches == 0


def test_caption_passthrough(annotated):
    """The pipeline must not mutate the original caption column."""
    out, _ = annotated
    rows = out.select("image_id", "caption", "defect").collect()
    regen = {r.image_id: r.caption for r in generate_rows(N_ROWS)}
    for row in rows:
        assert row.caption == regen[row.image_id]


def test_pixel_passthrough(annotated):
    """bytes flow through untouched: decode both sides, PSNR >= 40 dB
    (identical for lossless PPM -> PSNR inf)."""
    out, _ = annotated
    sample = out.select("image_id", "bytes").limit(50).collect()
    originals = {r.image_id: r.bytes for r in generate_rows(N_ROWS)}
    for row in sample:
        got = decode_ppm(bytes(row.bytes))
        want = decode_ppm(bytes(originals[row.image_id]))
        assert got.shape == want.shape
        assert psnr(got, want) >= 40.0
        assert np.allclose(got, want)


def test_audit_report(annotated):
    out, report = annotated
    by_id = {r.rule_id: r for r in report.results}
    total = out.count()
    nulls = out.filter("caption is null").count()
    assert by_id["caption_present"].records_evaluated == total
    assert by_id["caption_present"].pass_rate == pytest.approx(1 - nulls / total)
    # every rule produced a result with a sane pass rate
    for r in report.results:
        assert r.records_evaluated > 0
        assert 0.0 <= r.pass_rate <= 1.0
    # drop reasons are visible per rule: charset rule must be failing some rows
    assert by_id["charset"].pass_rate < 1.0


def test_image_metadata_rule(spark, models):
    """Corrupted byte payloads are caught by the metadata-consistency rule."""
    langid_model, ppl_model = models
    df = generate_images_df(spark, 50)
    corrupted = df.withColumn(
        "bytes",
        F.when(F.col("image_id") == "img00000007", F.lit(b"P6\nbogus")).otherwise(
            F.col("bytes")
        ),
    )
    pipe = QualityFilterPipeline(
        QualityFilterConfig(allowed_langs=LANGUAGES), langid_model, ppl_model
    )
    out, report = pipe.run(corrupted)
    bad = out.filter("image_id = 'img00000007'").collect()[0]
    assert bad["dq_image_metadata_passing"] is False
    assert bad["keep"] is False
    by_id = {r.rule_id: r for r in report.results}
    assert by_id["image_metadata"].pass_rate == pytest.approx(49 / 50)


def test_checkpoint_resume(spark, tmp_path, models):
    langid_model, ppl_model = models
    df = generate_images_df(spark, 400)
    pipe = QualityFilterPipeline(
        QualityFilterConfig(allowed_langs=LANGUAGES), langid_model, ppl_model
    )
    out_path = str(tmp_path / "out")
    manifest = str(tmp_path / "manifest.json")

    first = run_checkpointed(
        df, out_path, manifest, key_col="image_id",
        transform=pipe.annotate, n_buckets=4, buckets_per_batch=2,
    )
    assert first["buckets_run"] == 4
    total_rows = spark.read.parquet(out_path).count()
    assert total_rows == 400

    # resume: nothing left to do, output unchanged (idempotent)
    second = run_checkpointed(
        df, out_path, manifest, key_col="image_id",
        transform=pipe.annotate, n_buckets=4, buckets_per_batch=2,
    )
    assert second["buckets_run"] == 0
    assert second["buckets_skipped"] == 4
    assert spark.read.parquet(out_path).count() == 400

    # partial-failure simulation: drop two buckets from the manifest,
    # rerun -> exactly those buckets reprocess, counts unchanged
    import json

    state = json.loads((tmp_path / "manifest.json").read_text())
    for b in ("0", "2"):
        state["completed"].pop(b)
    (tmp_path / "manifest.json").write_text(json.dumps(state))
    third = run_checkpointed(
        df, out_path, manifest, key_col="image_id",
        transform=pipe.annotate, n_buckets=4, buckets_per_batch=2,
    )
    assert third["buckets_run"] == 2
    assert spark.read.parquet(out_path).count() == 400


def test_run_with_output_path_scores_once(spark, tmp_path, models):
    """pipeline.run(df, output_path=...) must write once and audit the
    WRITTEN flags: the audit side is a plain parquet scan with no Python
    (Arrow UDF) stage, so the scoring UDFs execute exactly once."""
    langid_model, ppl_model = models
    df = generate_images_df(spark, 120)
    pipe = QualityFilterPipeline(
        QualityFilterConfig(allowed_langs=LANGUAGES), langid_model, ppl_model
    )
    out_path = str(tmp_path / "run_out")
    written, report = pipe.run(df, output_path=out_path)
    assert written.count() == 120
    assert {r.rule_id for r in report.results} >= {"caption_present", "lang_allowed"}

    # the audit input (re-read output) contains no scoring stage
    audit_plan = (
        written.agg(*pipe.audit_agg_exprs())._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "ArrowEvalPython" not in audit_plan
    assert "BatchEvalPython" not in audit_plan
    assert "Scan parquet" in audit_plan or "FileScan parquet" in audit_plan


def test_run_without_output_persists_annotated(spark, models):
    """Without an output path, run() persists the annotated frame so the
    audit materialises the cache and later reads reuse it (no double score)."""
    langid_model, ppl_model = models
    df = generate_images_df(spark, 60)
    pipe = QualityFilterPipeline(
        QualityFilterConfig(allowed_langs=LANGUAGES), langid_model, ppl_model
    )
    annotated, report = pipe.run(df)
    try:
        assert annotated.storageLevel.useMemory or annotated.storageLevel.useDisk
        assert report.results
        # cache already materialised by the audit -> InMemoryTableScan serves reads
        plan = annotated._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        annotated.unpersist(blocking=False)


def test_keep_agrees_exactly_per_defect(annotated):
    """Exactness gate behind pipeline_keep_by_defect: EVERY defect class
    agrees with the planted labels row-for-row (n_agree == n), which is what
    makes the empty pipeline_disagreements oracle hold."""
    out, _ = annotated
    rows = out.groupBy("defect").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("keep") == F.col("expected_keep")).cast("long")).alias("n_agree"),
    ).collect()
    mismatched = {r.defect: (r.n_agree, r.n) for r in rows if r.n_agree != r.n}
    assert not mismatched, mismatched
