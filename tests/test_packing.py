"""pack_sequences: token conservation, exact-length invariant, boundary
lineage, determinism. The Python reference packs the same id-ordered
stream per partition and must agree sequence-for-sequence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.packing import pack_sequences


def _docs(spark, n=60, seed_mod=7):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(1 + (i * seed_mod) % 23)))
        for i in range(n)
    ]
    rows += [(n, None), (n + 1, ""), (n + 2, "   ")]
    return spark.createDataFrame(rows, "id long, text string")


def test_pack_exact_length_and_conservation(spark):
    df = _docs(spark)
    packed = pack_sequences(df, "text", "id", seq_len=50, num_partitions=3)
    rows = packed.collect()
    # every non-final sequence is exactly seq_len; <=1 final per partition
    for r in rows:
        if not r.is_final:
            assert r.n_tokens == 50
            assert len(r.text.split()) == 50
    finals = [r for r in rows if r.is_final]
    assert len(finals) <= 3
    # conservation: emitted tokens == doc tokens + one separator per doc
    n_docs = df.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    ).count()
    doc_tokens = sum(
        len(r.text.split())
        for r in df.collect()
        if r.text is not None and r.text.strip()
    )
    assert sum(r.n_tokens for r in rows) == doc_tokens + n_docs


def test_pack_matches_python_reference_per_partition(spark):
    df = _docs(spark, n=40)
    packed = pack_sequences(df, "text", "id", seq_len=32, num_partitions=2)
    rows = packed.collect()
    # Spark owns the repartition(key) placement — instead of predicting
    # it, verify against the doc_ids lineage: per partition, concatenating
    # sequences in seq_idx order must equal concatenating its docs (id
    # order) + separators
    by_part: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.part_id, r.seq_idx)):
        by_part.setdefault(r.part_id, []).append(r)
    doc_text = {r.id: r.text for r in df.collect()}
    for part, seqs in by_part.items():
        # the docs owned by this partition, in packed order, are exactly
        # the deduped doc_ids lineage
        owned: list[int] = []
        for s in seqs:
            for d in s.doc_ids:
                if not owned or owned[-1] != d:
                    owned.append(d)
        assert owned == sorted(owned)  # id-sorted within partition
        expected = []
        for d in owned:
            expected.extend(doc_text[d].split())
            expected.append("<|endofdoc|>")
        got = []
        for s in seqs:
            got.extend(s.text.split())
        assert got == expected, f"partition {part} stream mismatch"
    # all non-empty docs appear in exactly one partition's lineage
    all_owned = sorted(
        d for seqs in by_part.values() for s in seqs for d in set(s.doc_ids)
    )
    expected_ids = sorted(
        r.id for r in df.collect() if r.text is not None and r.text.strip()
    )
    assert sorted(set(all_owned)) == expected_ids


def test_pack_boundary_doc_in_both_sequences(spark):
    # one 10-token doc packed at seq_len 6: split across two sequences,
    # listed in both; second is final with 5 tokens (10 + 1 sep = 11)
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "id long, text string"
    )
    rows = pack_sequences(
        df, "text", "id", seq_len=6, num_partitions=1
    ).collect()
    assert [r.n_tokens for r in rows] == [6, 5]
    assert rows[0].doc_ids == [1] and rows[1].doc_ids == [1]
    assert rows[1].is_final and not rows[0].is_final


def test_pack_deterministic_across_runs(spark):
    df = _docs(spark, n=50)
    a = pack_sequences(df, "text", "id", seq_len=40, num_partitions=4)
    b = pack_sequences(df, "text", "id", seq_len=40, num_partitions=4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_pack_validates_seq_len(spark):
    df = _docs(spark, n=3)
    with pytest.raises(ValueError):
        pack_sequences(df, "text", "id", seq_len=0)


def test_pack_unicode_whitespace_matches_token_count(spark):
    """ADVICE r5: packing must tokenize on the ASCII \\s class (the repo's
    Java \\s+ convention, which the RE2 oracle mirrors), NOT Python
    str.split()'s Unicode whitespace — U+00A0/U+2028/U+0085/\\x1c must stay
    inside tokens so token conservation holds on non-ASCII text."""
    from gchq_data_quality_spark.functions.text import token_count

    rows = [
        (0, "a b c"),  # NBSP glues a and b into one token
        (1, "x y\tz"),  # line separator glued; tab splits
        (2, "pq \x1c r"),  # NEL and FS are token bytes
        (3, "one\x0btwo"),  # \x0b IS Java \s -> two tokens
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    packed = pack_sequences(df, "text", "id", seq_len=64, num_partitions=1)
    emitted = sum(r.n_tokens for r in packed.collect())
    jvm_tokens = df.agg(F.sum(token_count(F.col("text")))).collect()[0][0]
    # conservation: emitted == jvm token count + one separator per doc
    assert emitted == jvm_tokens + len(rows)
