#!/usr/bin/env python
"""Tour of the corpus-curation operator surface on the driver testdata:
exact + near-dup dedup, duplicate-cluster structure, decontamination,
chunking, deterministic sampling, as-of / range joins, and outlier screens.

    python examples/curation_ops_example.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from gchq_data_quality_spark.functions.dedup import (  # noqa: E402
    duplicate_groups,
    minhash_dedup,
    ngram_jaccard_pairs,
)
from gchq_data_quality_spark.functions.relational import (  # noqa: E402
    asof_join,
    connected_components,
)
from gchq_data_quality_spark.functions.stats import (  # noqa: E402
    groupwise_outlier_counts,
    stratified_sample,
)
from gchq_data_quality_spark.functions.text import chunk_documents  # noqa: E402
from gchq_data_quality_spark.sources.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cores=4, app_name="curation-ops-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    print("== exact duplicate groups (top 5) ==")
    duplicate_groups(docs, "text", "doc_id").orderBy(F.desc("n")).show(5)

    print("== near-dup dedup: rows before/after (minhash LSH -> exact verify) ==")
    kept = minhash_dedup(docs, "text", "doc_id", threshold=0.7, transitive=True)
    print(f"{docs.count()} -> {kept.count()} rows")

    print("== duplicate-cluster size histogram ==")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.7)
    labels = connected_components(pairs)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    ).orderBy("cluster_size").show()

    print("== 64-token chunks with 16-token overlap (first 3) ==")
    chunk_documents(docs, "text", "doc_id").show(3, truncate=60)

    print("== deterministic 30% sample: same rows every run ==")
    sample = stratified_sample(docs, "doc_id", 300)
    print(f"sampled {sample.count()} of {docs.count()}")

    print("== per-type value outliers (|z| > 3) ==")
    groupwise_outlier_counts(events, ["event_type"], "value").show()

    print("== as-of: time since the user's previous error event ==")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("ts").alias("err_ts")
    )
    joined = asof_join(
        events.select("user_id", "event_id", "ts"),
        errors,
        by=["user_id"], left_on="ts", right_on="ts",
        value_cols=["err_ts"], strict=True, tiebreak="event_id",
    )
    joined.filter(F.col("err_ts").isNotNull()).select(
        "user_id",
        "event_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("err_ts").cast("timestamp"))
        ).alias("lag_us"),
    ).show(5)

    print("== incremental ingestion: batch 2 vs batch-1 fingerprints ==")
    from gchq_data_quality_spark.functions.dedup import (
        exact_dedup_incremental,
        fingerprints,
    )

    batch1 = docs.filter(F.col("doc_id") < 200)
    history = fingerprints(batch1, "text")
    survivors = exact_dedup_incremental(docs, history, "text", "doc_id")
    print(
        f"batch of {docs.count()} against {history.count()} prior prints "
        f"-> {survivors.count()} new rows"
    )

    print("== semantic (cluster-then-verify) embedding near-dup ==")
    from gchq_data_quality_spark.functions.similarity import semantic_dedup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    semantic_dedup_pairs(emb, threshold=0.95, n_cells=8).show(5)

    print("== vocabulary coverage (tokenizer-budget curve) ==")
    from gchq_data_quality_spark.functions.text import coverage_counts

    freq = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    coverage_counts(freq).show()

    print("== web curation: html -> text -> line dedup -> domain mix ==")
    from gchq_data_quality_spark.functions.dedup import dedup_lines
    from gchq_data_quality_spark.functions.stats import temperature_mix
    from gchq_data_quality_spark.functions.web import (
        extract_links,
        registrable_domain,
        strip_html,
        url_host,
    )

    pages = spark.createDataFrame(
        [
            (
                i,
                f"<html><body><h1>Page {i}</h1><p>Unique paragraph {i} "
                f"with enough words to count.</p>"
                f"<div>copyright example corp all rights reserved</div>"
                f"<a href='https://out{i % 3}.example.co.uk/x'>link</a>"
                f"</body></html>",
            )
            for i in range(8)
        ],
        "doc_id long, html string",
    )
    text = pages.select(
        "doc_id",
        strip_html(F.col("html")).alias("text"),
        extract_links(F.col("html")).alias("links"),
    )
    dedup_lines(text, max_dup=2, min_line_chars=8).select(
        "doc_id", "text", "n_lines_dropped"
    ).show(3, truncate=60)
    text.select(F.explode("links").alias("u")).select(
        registrable_domain(url_host(F.col("u"))).alias("outlink_domain")
    ).groupBy("outlink_domain").count().show()

    print("== temperature-rebalanced source mix ==")
    temperature_mix(docs, "source", "doc_id", alpha=0.3).groupBy(
        "source"
    ).count().orderBy("source").show()

    spark.stop()


if __name__ == "__main__":
    main()
