"""Train/test decontamination operator (functions/decontamination.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.decontamination import (
    contamination_hits,
    decontaminate,
    word_ngram_ids,
)

BENCH_SENTENCE = "the quick brown fox jumps over the lazy dog tonight"  # 10 words


def _frames(spark):
    probes = spark.createDataFrame(
        [(100, BENCH_SENTENCE), (101, "an entirely different benchmark prompt about spark plans here")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the probe sentence verbatim -> contaminated
            (1, f"intro words then {BENCH_SENTENCE} and a closing remark"),
            # shares only a 7-word prefix -> NOT contaminated at n=8
            (2, "the quick brown fox jumps over the sleepy cat in daylight"),
            # clean
            (3, "completely unrelated content mentioning parquet arrow catalyst and shuffles at scale"),
            # too short for any 8-gram
            (4, "tiny doc"),
            # null text must not blow up
            (5, None),
        ],
        "doc_id long, text string",
    )
    return docs, probes


def test_word_ngram_ids_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    sizes = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", F.size(word_ngram_ids(F.col("text"), 8)).alias("n")
        ).collect()
    }
    assert sizes[1] == 2  # 9 tokens -> 2 windows
    assert sizes[2] == 0
    assert sizes[3] == 0
    assert sizes[4] == -1  # null text -> null array (size -1), not a crash


def test_contamination_hits_and_decontaminate(spark):
    docs, probes = _frames(spark)
    hits = {
        r.doc_id: r.n_hits
        for r in contamination_hits(docs, probes, n=8).collect()
    }
    assert 1 in hits and hits[1] >= 1  # the planted overlap is found
    assert set(hits) == {1}  # nothing else flags

    kept = {r.doc_id for r in decontaminate(docs, probes, n=8).collect()}
    assert kept == {2, 3, 4, 5}


def test_contamination_distinct_hit_count(spark):
    """n_hits counts DISTINCT shared grams: a doc repeating the same probe
    sentence twice still counts each gram once."""
    probes = spark.createDataFrame([(0, BENCH_SENTENCE)], "doc_id long, text string")
    doubled = spark.createDataFrame(
        [(1, f"{BENCH_SENTENCE} {BENCH_SENTENCE}")], "doc_id long, text string"
    )
    once = spark.createDataFrame(
        [(2, BENCH_SENTENCE)], "doc_id long, text string"
    )
    h2 = contamination_hits(doubled, probes, n=8).collect()[0].n_hits
    h1 = contamination_hits(once, probes, n=8).collect()[0].n_hits
    # the doubled doc has EXTRA grams spanning the junction, all of which
    # are absent from the probe — the shared-gram count must not inflate
    assert h2 == h1 == 3  # 10-word sentence -> 3 distinct 8-grams


def test_contamination_plan_broadcasts_probe_side(spark):
    docs, probes = _frames(spark)
    plan = contamination_hits(docs, probes, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # big side must never shuffle for the join


def test_word_ngrams_strings(spark):
    from gchq_data_quality_spark.functions.decontamination import word_ngrams

    df = spark.createDataFrame([(1, "  The quick   brown fox ")], "doc_id long, text string")
    got = df.select(word_ngrams(F.col("text"), 2).alias("g")).collect()[0].g
    assert got == ["the quick", "quick brown", "brown fox"]


def test_top_ngrams_doc_frequency(spark):
    from gchq_data_quality_spark.functions.decontamination import top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "buy now limited offer"),
            (2, "buy now while stocks last"),
            (3, "buy now buy now"),  # repeated within one doc: counts ONCE
            (4, "something else entirely"),
        ],
        "doc_id long, text string",
    )
    rows = top_ngrams(docs, n=2, top=3).collect()
    assert rows[0].gram == "buy now" and rows[0].doc_freq == 3
    # deterministic tie-break: same doc_freq ordered by gram string
    freqs = [r.doc_freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
