#!/usr/bin/env python
"""Stage isolation for the LSH family at sf0.1 (guide §1.4: noop sink).

Times each successive prefix of the minhash/simhash pipelines so the delta
between stages attributes cost: scan, shingle+hash fold, band fold, window
cap + collect + pair expansion, distinct.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions import dedup as D
from gchq_data_quality_spark.sources.session import get_spark

SF = "/root/testdata/sf0.1/documents.parquet"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, rounds=3):
    out = []
    for _ in range(rounds):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return min(out), out


def main():
    spark = get_spark(cores=32, app_name="exp-lsh-stages")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(SF)

    stages = {}

    def shingled():
        base = D._ensure_parallelism(docs)
        return base.select(
            F.col("doc_id").alias("id"), D._hashed_shingles_expr("text", 5).alias("sh")
        )

    # 0. plain scan of text
    stages["scan_text"] = timed(lambda: noop(docs.select("doc_id", "text")))
    # 1. string shingles only (no xxhash, no distinct)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    n = F.length(norm) - F.lit(4)
    raw_sh = F.when(
        n > 0,
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(norm, i, F.lit(5))),
    ).otherwise(F.array(norm))
    stages["shingle_strings"] = timed(
        lambda: noop(D._ensure_parallelism(docs).select("doc_id", raw_sh.alias("s")))
    )
    # 1b. + array_distinct
    stages["shingle_distinct"] = timed(
        lambda: noop(
            D._ensure_parallelism(docs).select(
                "doc_id", F.array_distinct(raw_sh).alias("s")
            )
        )
    )
    # 2. hashed shingles (full _hashed_shingles)
    stages["hashed_shingles"] = timed(lambda: noop(shingled()))
    # 3. + band-bucket fold (the 32-family minhash fold + 8 band hashes)
    def banded():
        sh = shingled()
        return sh.select(
            "id", F.explode(D._band_buckets_expr("sh", 32, 8)).alias("bb")
        ).select("id", "bb.band", "bb.bucket")

    stages["band_fold"] = timed(lambda: noop(banded()))
    # 4. full minhash_candidate_pairs
    stages["minhash_candidates_full"] = timed(
        lambda: noop(
            D.minhash_candidate_pairs(docs, "text", "doc_id")
        )
    )
    # 5. carry-shingles verified pairs (lsh_verified_pairs core)
    stages["ngram_jaccard_full"] = timed(
        lambda: noop(D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.7))
    )
    # 5b. banded with carried shingles, pre-window (what rides the shuffle)
    def banded_carry():
        target = spark.sparkContext.defaultParallelism
        sh = shingled().repartition(target)
        return sh.select(
            "id", "sh", F.explode(D._band_buckets_expr("sh", 32, 8)).alias("bb")
        ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    stages["band_fold_carry"] = timed(lambda: noop(banded_carry()))
    # 5c. + window cap + collect_list (no pair expansion)
    def collected():
        b = banded_carry()
        w = Window.partitionBy("band", "bucket").orderBy("id")
        b = b.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= 64)
        return b.groupBy("band", "bucket").agg(
            F.sort_array(F.collect_list(F.struct(F.col("id"), F.col("sh")))).alias("ms")
        )

    stages["collect_carry"] = timed(lambda: noop(collected()))

    # 6. simhash: shingle fold only (the rot-buckets expr)
    def sim_buckets():
        rb = D._rot_buckets_expr("text", 3, 16, 192)
        return (
            D._ensure_parallelism(docs)
            .select(F.col("doc_id").alias("id"), F.explode(rb).alias("rb"))
            .select("id", "rb.sim", "rb.rot", "rb.bucket")
        )

    stages["simhash_fold"] = timed(lambda: noop(sim_buckets()))
    stages["simhash_full"] = timed(
        lambda: noop(D.simhash_dedup_pairs(docs, "text", "doc_id"))
    )
    # 6b. simhash shingle-hash part only at k=3
    norm3 = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    n3 = F.length(norm3) - F.lit(2)
    raw3 = F.when(
        n3 > 0,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n3), lambda i: F.substring(norm3, i, F.lit(3)))
        ),
    ).otherwise(F.array(norm3))
    hashed3 = F.transform(raw3, lambda s: F.xxhash64(s))
    stages["simhash_hashed3"] = timed(
        lambda: noop(D._ensure_parallelism(docs).select("doc_id", hashed3.alias("h")))
    )

    print(json.dumps(stages, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
