"""Gopher/RedPajama repetition metrics vs literal Python references.

The four repetition signals (duplicate line fraction, duplicate line CHAR
fraction, top-n-gram char fraction, duplicate-n-gram char fraction — Rae et
al. 2021 §A1.1, as read by the RedPajama quality signals) are pure Column
expressions; these tests pin them against character-for-character Python
reimplementations over seeded random corpora engineered to hit duplicates,
plus the empty/null/short-doc edges.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.text import (
    duplicate_line_char_fraction,
    duplicate_line_fraction,
    duplicate_ngram_char_fraction,
    top_ngram_char_fraction,
)


# ---------------------------------------------------------------------------
# Python references (the metric definitions, written independently)
# ---------------------------------------------------------------------------

def py_dup_line_fraction(text: str) -> float:
    lines = text.split("\n")
    return 1.0 - len(set(lines)) / len(lines) if lines else 0.0


def py_dup_line_char_fraction(text: str) -> float:
    lines = text.split("\n")
    total = sum(len(ln) for ln in lines)
    if total == 0:
        return 0.0
    distinct = sum(len(ln) for ln in set(lines))
    return (total - distinct) / total


def _py_grams(text: str, n: int) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.lower().strip()) if t != ""]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def py_top_ngram_char_fraction(text: str, n: int) -> float:
    if len(text) == 0:
        return 0.0
    grams = _py_grams(text, n)
    top = max((grams.count(g) * len(g) for g in set(grams)), default=0)
    return min(top / len(text), 1.0)


def py_dup_ngram_char_fraction(text: str, n: int) -> float:
    if len(text) == 0:
        return 0.0
    counts = Counter(_py_grams(text, n))
    dup = sum((c - 1) * len(g) for g, c in counts.items())
    return min(dup / len(text), 1.0)


# ---------------------------------------------------------------------------
# corpus generator: small vocab + phrase reuse so duplicates actually occur
# ---------------------------------------------------------------------------

def _random_docs(seed: int, n_docs: int = 60) -> list[str]:
    rng = random.Random(seed)
    vocab = ["buy", "now", "the", "cat", "sat", "on", "mat", "xyz", "a1"]
    lines_pool = [
        " ".join(rng.choices(vocab, k=rng.randint(1, 6))) for _ in range(8)
    ]
    docs = []
    for _ in range(n_docs):
        kind = rng.random()
        if kind < 0.1:
            docs.append("")
        elif kind < 0.2:
            docs.append(rng.choice(vocab))
        elif kind < 0.5:
            # line-structured doc with reused lines (dup-line metrics)
            docs.append(
                "\n".join(rng.choices(lines_pool, k=rng.randint(1, 10)))
            )
        else:
            # flowing text with a repeated phrase (n-gram metrics)
            phrase = rng.choice(lines_pool)
            parts = []
            for _ in range(rng.randint(1, 8)):
                parts.append(
                    phrase
                    if rng.random() < 0.5
                    else " ".join(rng.choices(vocab, k=rng.randint(1, 5)))
                )
            docs.append(" ".join(parts))
    docs.extend(
        [
            "one\none\none",  # pure line repetition
            "unique lines\nonly here\nno repeats",
            "buy now buy now buy now buy now",  # pure n-gram repetition
            "   ",  # whitespace-only: tokenless but 3 chars
            "tail space \n tail space ",  # lines differ only by layout
        ]
    )
    return docs


@pytest.mark.parametrize("seed", [1, 2])
def test_line_metrics_match_python_reference(spark, seed):
    docs = _random_docs(seed)
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    rows = df.select(
        "text",
        duplicate_line_fraction(F.col("text")).alias("dlf"),
        duplicate_line_char_fraction(F.col("text")).alias("dlcf"),
    ).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r.dlf == pytest.approx(py_dup_line_fraction(r.text)), r.text
        assert r.dlcf == pytest.approx(py_dup_line_char_fraction(r.text)), r.text


@pytest.mark.parametrize("seed,n", [(3, 2), (4, 3), (5, 5)])
def test_ngram_metrics_match_python_reference(spark, seed, n):
    docs = _random_docs(seed)
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    rows = df.select(
        "text",
        top_ngram_char_fraction(F.col("text"), n).alias("topf"),
        duplicate_ngram_char_fraction(F.col("text"), n).alias("dupf"),
    ).collect()
    for r in rows:
        assert r.topf == pytest.approx(
            py_top_ngram_char_fraction(r.text, n)
        ), r.text
        assert r.dupf == pytest.approx(
            py_dup_ngram_char_fraction(r.text, n)
        ), r.text


def test_repetition_metrics_edges(spark):
    """Null / empty / sub-n-token docs: no null leaks (zip_with padding
    would fabricate [null] grams that null-skipping F.least turns into
    1.0), and values match the Python references. Note "a b" legitimately
    scores top-2-gram fraction 1.0 — the whole doc IS one 2-gram."""
    docs = [None, "", "word", "a b", "a b c d"]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    out = df.select(
        "text",
        duplicate_line_fraction(F.col("text")).alias("dlf"),
        duplicate_line_char_fraction(F.col("text")).alias("dlcf"),
        top_ngram_char_fraction(F.col("text"), 2).alias("topf"),
        duplicate_ngram_char_fraction(F.col("text"), 5).alias("dupf"),
    ).collect()
    for r in out:
        text = r.text if r.text is not None else ""
        assert r.dlf == pytest.approx(py_dup_line_fraction(text)), r.text
        assert r.dlcf == pytest.approx(py_dup_line_char_fraction(text)), r.text
        assert r.topf == pytest.approx(
            py_top_ngram_char_fraction(text, 2)
        ), r.text
        assert r.dupf == pytest.approx(
            py_dup_ngram_char_fraction(text, 5)
        ), r.text


def test_repetition_metrics_flag_boilerplate(spark):
    """Sanity direction check: spammy docs score above clean prose."""
    spam = "buy now " * 20
    clean = "the quick brown fox jumps over one lazy dog near a quiet river"
    df = spark.createDataFrame([(spam,), (clean,)], "text string")
    rows = {
        r.text: r
        for r in df.select(
            "text",
            top_ngram_char_fraction(F.col("text"), 2).alias("topf"),
            duplicate_ngram_char_fraction(F.col("text"), 5).alias("dupf"),
        ).collect()
    }
    assert rows[spam].topf > 0.8 > rows[clean].topf
    assert rows[spam].dupf > 0.8 > rows[clean].dupf
