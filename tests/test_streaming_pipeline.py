"""Streaming quality filter: the annotate plan is stateless (narrow
transformations + pandas UDF), so the same pipeline runs unchanged on a
Structured Streaming source — readStream -> annotate -> sink.
"""

from __future__ import annotations

import pytest

from gchq_data_quality_spark.functions.langid import train_langid
from gchq_data_quality_spark.functions.perplexity import train_perplexity
from gchq_data_quality_spark.pipeline import QualityFilterConfig, QualityFilterPipeline
from gchq_data_quality_spark.sources.synthetic import (
    LANGUAGES,
    generate_images_df,
    training_corpus,
)


def test_streaming_quality_filter(spark, tmp_path):
    src = tmp_path / "stream_in"
    sink = tmp_path / "stream_out"
    ckpt = tmp_path / "ckpt"

    batch = generate_images_df(spark, 300)
    batch.write.parquet(str(src))

    texts, labels = training_corpus()
    pipe = QualityFilterPipeline(
        QualityFilterConfig(allowed_langs=LANGUAGES),
        train_langid(texts, labels),
        train_perplexity(texts),
    )

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    assert stream.isStreaming
    annotated = pipe.annotate(stream)
    query = (
        annotated.filter("keep")
        .select("image_id", "bytes", "caption_scrubbed", "phash")
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)

    out = spark.read.parquet(str(sink))
    expected_keep = batch.filter("expected_keep").count()
    kept = out.count()
    # keep/drop agreement carries over to the streaming plan
    assert kept == pytest.approx(expected_keep, abs=max(3, expected_keep * 0.01))
    assert set(out.columns) == {"image_id", "bytes", "caption_scrubbed", "phash"}

    # resume semantics: restarting with the same checkpoint adds nothing new
    query2 = (
        pipe.annotate(spark.readStream.schema(batch.schema).parquet(str(src)))
        .filter("keep")
        .select("image_id", "bytes", "caption_scrubbed", "phash")
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    query2.awaitTermination(120)
    assert spark.read.parquet(str(sink)).count() == kept
