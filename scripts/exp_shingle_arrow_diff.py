#!/usr/bin/env python
"""Differential: shingle_arrow vs the native dedup.py expressions.

Asserts BIT-IDENTICAL (sh, sig, sim) on sf0.1 documents plus an edge-case
corpus (nulls, empties, short docs, unicode whitespace, CJK, emoji,
boundary-length docs).
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gchq_data_quality_spark.functions import dedup as D
from gchq_data_quality_spark.functions.shingle_arrow import shingle_frame
from gchq_data_quality_spark.sources.session import get_spark


def check(spark, df, k, n_hashes, sample, label):
    native = df.select(
        F.col("doc_id").alias("id"),
        D._hashed_shingles(F.col("text"), k).alias("sh"),
        D._minhash_signature(
            D._hashed_shingles(F.col("text"), k), n_hashes
        ).alias("sig"),
        D._simhash_fold(
            F.col("text"), k, D._assemble_simhash, sample=sample
        ).alias("sim") if k == 3 else F.lit(None).cast("long").alias("sim"),
    )
    arrow = shingle_frame(
        df, "text", "doc_id", k, want_sh=True, n_hashes=n_hashes,
        simhash_sample=sample if k == 3 else "unset",
    )
    nat = {r["id"]: r for r in native.collect()}
    arr = {r["id"]: r for r in arrow.collect()}
    assert set(nat) == set(arr), (label, "id sets differ")
    bad = 0
    for i in nat:
        if nat[i]["sh"] != arr[i]["sh"]:
            bad += 1
            print(f"{label} SH MISMATCH id={i}\n  nat={nat[i]['sh'][:8]}\n  arr={arr[i]['sh'][:8]}")
        if nat[i]["sig"] != arr[i]["sig"]:
            bad += 1
            print(f"{label} SIG MISMATCH id={i}\n  nat={nat[i]['sig'][:8]}\n  arr={arr[i]['sig'][:8]}")
        if k == 3 and nat[i]["sim"] != arr[i]["sim"]:
            bad += 1
            print(f"{label} SIM MISMATCH id={i} nat={nat[i]['sim']} arr={arr[i]['sim']}")
        if bad > 5:
            raise SystemExit(f"{label}: too many mismatches")
    print(f"{label}: {len(nat)} docs OK (k={k}, n_hashes={n_hashes}, sample={sample})")


def main():
    spark = get_spark(cores=8, app_name="shingle-arrow-diff")
    spark.sparkContext.setLogLevel("ERROR")

    edge = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "a"),
            (3, "ab"),
            (4, "abcd"),
            (5, "abcde"),
            (6, "hello   world\t\twith \n whitespace   runs"),
            (7, "ÜPPER löwer ÄÖÜ straße"),
            (8, "日本語のテキストです。重複排除のテスト。"),
            (9, "emoji 🎉🎉🎉 and ASCII mixed"),
            (10, "nbsp and unicodewhitespace here"),
            (11, "ΣΑΣ ΓΕΙΑ σας"),
            (12, "x" * 4),
            (13, "x" * 5),
            (14, "repeat " * 2000),
            (15, "Mixed ascii then 中文 then ascii again padding padding"),
            (16, "  leading and trailing  "),
            (17, "TAB\tSEP\tVALS\t1\t2\t3"),
            (18, "ascii only but quite long " * 400),
            (19, "İstanbul DİYARBAKIR ınce"),
        ],
        "doc_id long, text string",
    )
    check(spark, edge, 5, 32, None, "edge k=5")
    check(spark, edge, 3, 8, 192, "edge k=3 sampled")
    check(spark, edge, 3, 8, 2, "edge k=3 sample=2")
    check(spark, edge, 3, 8, None, "edge k=3 exact")

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    check(spark, docs, 5, 32, None, "sf0.01 k=5")
    check(spark, docs, 3, 8, 192, "sf0.01 k=3 sampled")
    docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    check(spark, docs1, 5, 32, None, "sf0.1 k=5")
    check(spark, docs1, 3, 8, 192, "sf0.1 k=3 sampled")
    print("ALL DIFFERENTIALS PASS")
    spark.stop()


if __name__ == "__main__":
    main()
