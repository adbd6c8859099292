"""The engine's sessions disable ANSI, but the DRIVER calls entry()/queries()
with its own session — Spark 4 defaults to ANSI mode there, where a wrapping
multiply raises ARITHMETIC_OVERFLOW instead of wrapping. Every hash-combine
in the query surface must therefore be overflow-free BY CONSTRUCTION
(31-bit coefficients x 32-bit masked values). This suite flips the runtime
ANSI flag on the shared session and runs the arithmetic-heavy operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def ansi(spark):
    previous = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", previous)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river today"
    rows = [(0, base), (1, base), (2, base.replace("today", "tonight")),
            (3, "completely different content about machine learning")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_under_ansi(ansi, docs):
    from gchq_data_quality_spark.functions.dedup import minhash_candidate_pairs

    pairs = {(r.id_a, r.id_b) for r in minhash_candidate_pairs(docs, "text", "doc_id").collect()}
    assert (0, 1) in pairs


def test_simhash_under_ansi(ansi, docs):
    from gchq_data_quality_spark.functions.dedup import simhash_dedup_pairs

    pairs = {(r.id_a, r.id_b) for r in simhash_dedup_pairs(docs, "text", "doc_id", max_hamming=8).collect()}
    assert (0, 1) in pairs


def test_repetition_and_text_heuristics_under_ansi(ansi, spark):
    from gchq_data_quality_spark.functions.text import (
        fingerprint,
        quality_score,
        repetition_ratio,
    )

    df = spark.createDataFrame(
        [("buy now buy now buy now",), ("a perfectly ordinary sentence here",)],
        "text string",
    )
    rows = df.select(
        repetition_ratio(F.col("text")).alias("rep"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert rows[0].rep > 0.4 and rows[1].rep == 0.0


def test_entry_pipeline_under_ansi(ansi):
    """The driver smoke-check shape: entry(spark) on an ANSI session."""
    import __spark_entry__ as m

    out = m.entry(ansi)
    assert out.count() >= 1


def test_repetition_matches_non_ansi_values(spark, docs):
    """Flipping ANSI must not change values — the arithmetic is bounded,
    not silently wrapping differently per mode."""
    from gchq_data_quality_spark.functions.text import repetition_ratio

    expr = repetition_ratio(F.col("text")).alias("r")
    plain = [r.r for r in docs.select(expr).collect()]
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        strict = [r.r for r in docs.select(expr).collect()]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    assert plain == strict


def test_decontamination_under_ansi(ansi, spark):
    from gchq_data_quality_spark.functions.decontamination import contamination_hits

    probe_text = "the quick brown fox jumps over the lazy dog tonight"
    probes = spark.createDataFrame([(0, probe_text)], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, f"prefix {probe_text} suffix"), (2, "clean unrelated content here about nothing special at all")],
        "doc_id long, text string",
    )
    hits = {r.doc_id for r in contamination_hits(docs, probes, n=8).collect()}
    assert hits == {1}


def test_lsh_verified_pairs_under_ansi(ansi, docs):
    from gchq_data_quality_spark.functions.dedup import ngram_jaccard_pairs

    pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.7).collect()}
    assert (0, 1) in pairs


def test_sampling_hash_and_new_queries_under_ansi(ansi):
    """The sampling LCG masks ids to 31 bits before the multiply (max
    intermediate ~2.4e18 < 2^63), and the as-of / range-join / retention
    arithmetic is epoch-micros bounded — all must run under ANSI unchanged."""
    import __spark_entry__ as m

    qs = m.queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "stratified_sample_stats",
        "asof_time_since_error",
        "orders_nearby_window",
        "weekly_retention",
        "ivf_cell_assignment",
        "dataset_split_counts",
        "source_mix_sample",
        "events_sliding_window",
        "document_chunks",
        "signup_purchase_funnel",
    ):
        assert qs[name](ansi, sf).count() > 0, name


def test_round4_queries_under_ansi(ansi):
    """Round-4 additions: the planted-fingerprint derivation multiplies
    31-bit-bounded quadrant values by powers of two summing below 2^63;
    the vocab closed-form threshold arithmetic peaks at 100*total_tokens;
    the simhash assembly fold's bit placement multiplies {0,1} by <= 2^60
    before a static shift. All must run to completion under ANSI."""
    import __spark_entry__ as m

    qs = m.queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "fingerprint_pairs_oracle",
        "vocab_coverage",
        "simhash_pairs",
        "image_neardup_pairs",
        "media_features",
        "value_percentiles_by_type",
    ):
        assert qs[name](ansi, sf).count() > 0, name


def test_round5_queries_under_ansi(ansi):
    """Round-5 additions: the merged two-row rule queries are pure aggregate
    counts; embedding_pairs_oracle derives planted floats from 31-bit hashes
    (no integer multiply past 2^62) and verifies cosine in doubles;
    minhash_candidates and the in-struct lsh_verified_pairs verify reuse the
    overflow-free pmod family arithmetic. All must complete under ANSI."""
    import __spark_entry__ as m

    qs = m.queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "rule_completeness_pair",
        "rule_accuracy_pair",
        "embedding_pairs_oracle",
        "minhash_candidates",
        "lsh_verified_pairs",
        # late-r5: merged doc aggregate (xxhash64 fingerprint distinct) and
        # the synthetic-URL domain report (long modulo arithmetic, F.get
        # 0-based indexing — negative element_at would raise here)
        "doc_token_quality",
        "url_domain_curation",
    ):
        assert qs[name](ansi, sf).count() > 0, name


def test_web_curation_under_ansi(ansi):
    """registrable_domain compiles every branch's expression even where the
    n<=2 branch wins; 0-based F.get must keep single-label hosts
    (localhost) and raw IPs error-free under ANSI (negative element_at
    would raise ARRAY_INDEX_OUT_OF_BOUNDS there)."""
    from gchq_data_quality_spark.functions.web import (
        registrable_domain,
        url_host,
        url_quality_flags,
    )

    df = ansi.createDataFrame(
        [("https://localhost/x",), ("https://10.0.0.1/y",),
         ("https://www.bbc.co.uk/news",), ("garbage",), (None,)],
        "url string",
    )
    rows = df.select(
        registrable_domain(url_host(F.col("url"))).alias("d"),
        url_quality_flags(F.col("url")).alias("f"),
    ).collect()
    assert [r.d for r in rows] == [
        "localhost", "10.0.0.1", "bbc.co.uk", None, None,
    ]
