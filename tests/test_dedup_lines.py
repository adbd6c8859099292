"""Corpus-level line deduplication (functions/dedup.dedup_lines) — the
RefinedWeb/CCNet boilerplate-removal operator: a line whose normalized form
occurs more than max_dup times anywhere in the corpus is dropped from every
document; short lines are exempt; order and untouched docs are preserved."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from gchq_data_quality_spark.functions.dedup import dedup_lines


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_lines_drops_hot_boilerplate_everywhere(spark):
    boiler = "subscribe to our newsletter today"
    rows = [
        (i, f"unique content line {i} aaaa\n{boiler}\nmore unique {i} bbbb")
        for i in range(5)
    ]
    rows.append((99, None))
    out = {
        r.doc_id: r
        for r in dedup_lines(_mk(spark, rows), max_dup=2, min_line_chars=8).collect()
    }
    for i in range(5):
        assert out[i].text == f"unique content line {i} aaaa\nmore unique {i} bbbb"
        assert out[i].n_lines_dropped == 1
    assert out[99].text is None and out[99].n_lines_dropped == 0


def test_dedup_lines_normalized_matching_and_boundary(spark):
    # case/whitespace variants of one line count as ONE normalized form;
    # exactly max_dup occurrences stay (strictly-greater drops)
    rows = [
        (1, "Repeated Line Here\nkeep one 1111"),
        (2, "repeated   line here\nkeep two 2222"),
        (3, "REPEATED LINE  HERE \nkeep three 3333"),
        (4, "twice only line\nkeep four 4444"),
        (5, "twice  ONLY line\nkeep five 5555"),
    ]
    out = {
        r.doc_id: r
        for r in dedup_lines(_mk(spark, rows), max_dup=2, min_line_chars=8).collect()
    }
    for i in (1, 2, 3):
        assert out[i].n_lines_dropped == 1  # 3 occurrences > max_dup=2
        assert out[i].text.startswith("keep")
    for i in (4, 5):
        assert out[i].n_lines_dropped == 0  # exactly 2 = max_dup -> kept


def test_dedup_lines_short_lines_exempt_and_empty_doc(spark):
    rows = [
        (1, "short\nall boilerplate content line"),
        (2, "short\nall boilerplate content line"),
        (3, "short\nall boilerplate content line"),
    ]
    out = {
        r.doc_id: r
        for r in dedup_lines(_mk(spark, rows), max_dup=2, min_line_chars=8).collect()
    }
    # 'short' (5 chars) repeats 3x but is exempt; the long line drops
    # everywhere, leaving only the short line
    for i in (1, 2, 3):
        assert out[i].text == "short"
        assert out[i].n_lines_dropped == 1


def test_dedup_lines_whole_doc_dropped_becomes_empty(spark):
    rows = [(i, "only the same boilerplate") for i in range(4)]
    out = dedup_lines(_mk(spark, rows), max_dup=2, min_line_chars=8).collect()
    assert all(r.text == "" and r.n_lines_dropped == 1 for r in out)


def test_dedup_lines_preserves_other_columns_and_order(spark):
    df = spark.createDataFrame(
        [(1, "alpha unique line one\ncommon repeated line x\nbeta unique line two", "keepme")],
        "doc_id long, text string, extra string",
    ).union(
        spark.createDataFrame(
            [(k, "common repeated line x", "e") for k in (2, 3, 4)],
            "doc_id long, text string, extra string",
        )
    )
    row = {r.doc_id: r for r in dedup_lines(df, max_dup=2, min_line_chars=8).collect()}[1]
    assert row.text == "alpha unique line one\nbeta unique line two"  # order kept
    assert row.extra == "keepme"


def _python_reference(rows, max_dup, min_chars):
    def norm(line):
        s = re.sub(r"[\x00-\x08\x0b-\x1f\x7f-\x9f]", " ", line)
        return re.sub(r"\s+", " ", s).strip().lower()

    def eligible(line):
        # Spark trim strips ASCII spaces only
        return len(line.strip(" ")) >= min_chars

    counts = Counter()
    for _, text in rows:
        if text is None:
            continue
        for line in text.split("\n"):
            if eligible(line):
                counts[norm(line)] += 1
    expected = {}
    for doc_id, text in rows:
        if text is None:
            expected[doc_id] = (None, 0)
            continue
        kept, dropped = [], 0
        for line in text.split("\n"):
            if eligible(line) and counts[norm(line)] > max_dup:
                dropped += 1
            else:
                kept.append(line)
        expected[doc_id] = ("\n".join(kept), dropped)
    return expected


def test_dedup_lines_randomized_differential(spark):
    rng = np.random.default_rng(1234)
    pool = (
        [f"hot boilerplate number {i} zzzz" for i in range(4)]
        + [f"warm line {i} yyyy" for i in range(8)]
        + ["tiny", "  ", ""]
    )
    rows = []
    for doc_id in range(60):
        n = int(rng.integers(1, 7))
        lines = [
            pool[int(rng.integers(0, len(pool)))]
            if rng.random() < 0.6
            else f"unique {doc_id}-{j} xxxxxxxx"
            for j in range(n)
        ]
        rows.append((doc_id, "\n".join(lines)))
    rows.append((998, None))
    for max_dup, min_chars in ((1, 8), (2, 8), (3, 1), (2, 30)):
        expected = _python_reference(rows, max_dup, min_chars)
        got = {
            r.doc_id: (r.text, r.n_lines_dropped)
            for r in dedup_lines(
                _mk(spark, rows), max_dup=max_dup, min_line_chars=min_chars
            ).collect()
        }
        assert got == expected, (max_dup, min_chars)


def test_dedup_lines_paragraph_mode(spark):
    boiler = "standard footer paragraph with legal text"
    rows = [
        (i, f"real paragraph {i} with content\nsecond line\n\n{boiler}")
        for i in range(4)
    ]
    out = {
        r.doc_id: r
        for r in dedup_lines(
            _mk(spark, rows), max_dup=2, min_line_chars=8, sep="\n\n"
        ).collect()
    }
    for i in range(4):
        # the footer PARAGRAPH drops; the multi-line content paragraph
        # (unique per doc) survives with its internal newline intact
        assert out[i].text == f"real paragraph {i} with content\nsecond line"
        assert out[i].n_lines_dropped == 1
