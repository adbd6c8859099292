"""Experiment: lsh_verified_pairs shingle-fold-sharing variants (VERDICT r4 Next #3).

V0: current ngram_jaccard_pairs (lazy — shingle hashing computed 3x across
    the candidate lineage and the two verify join sides)
V1: exchange-reuse — repartition AFTER the shingle projection so all three
    lineages share one identical Exchange subtree; ReusedExchange computes
    the hashing once and serves the other lineages from shuffle files
V2: in-struct verify — carry the hashed-shingle arrays inside the bucket
    collect_list structs and intersect in-lambda (no verify joins at all)
V3: localCheckpoint (judge's option A, re-measured)

Interleaved min-of-k on sf0.1 documents; prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from gchq_data_quality_spark.functions.dedup import (  # noqa: E402
    _band_buckets_expr,
    _candidates_from_shingled,
    _ensure_parallelism,
    _expand_bucket_pairs,
    _hashed_shingles_expr,
    ngram_jaccard_pairs,
)
from gchq_data_quality_spark.sources.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = 0.7


def _verify_joined(shingled, candidates, threshold):
    a = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def v0(docs):
    return ngram_jaccard_pairs(docs, "text", "doc_id", threshold=THRESHOLD)


def v1(docs):
    target = docs.sparkSession.sparkContext.defaultParallelism
    docs = _ensure_parallelism(docs)
    shingled = docs.select(
        F.col("doc_id").alias("id"), _hashed_shingles_expr("text", 5).alias("sh")
    ).repartition(target)
    candidates = _candidates_from_shingled(shingled, 32, 8, 64)
    return _verify_joined(shingled, candidates, THRESHOLD)


def v2(docs):
    target = docs.sparkSession.sparkContext.defaultParallelism
    docs = _ensure_parallelism(docs)
    shingled = docs.select(
        F.col("doc_id").alias("id"), _hashed_shingles_expr("text", 5).alias("sh")
    ).repartition(target)
    banded = shingled.select(
        "id",
        "sh",
        F.explode(_band_buckets_expr("sh", 32, 8)).alias("bb"),
    ).select(
        "id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )

    def make_pair(x, y):
        inter = F.size(F.array_intersect(x["sh"], y["sh"]))
        union = F.size(F.array_union(x["sh"], y["sh"]))
        return F.struct(
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            (inter / union).alias("jaccard"),
        )

    return (
        _expand_bucket_pairs(
            banded,
            keys=["band", "bucket"],
            member=F.struct(F.col("id"), F.col("sh")),
            make_pair=make_pair,
            max_bucket=64,
            keep=lambda p: p["jaccard"] >= THRESHOLD,
        )
        .select("p.id_a", "p.id_b", "p.jaccard")
        .distinct()
    )


def v3(docs):
    target = docs.sparkSession.sparkContext.defaultParallelism
    docs = _ensure_parallelism(docs)
    shingled = (
        docs.select(
            F.col("doc_id").alias("id"), _hashed_shingles_expr("text", 5).alias("sh")
        )
        .repartition(target)
        .localCheckpoint()
    )
    candidates = _candidates_from_shingled(shingled, 32, 8, 64)
    return _verify_joined(shingled, candidates, THRESHOLD)


def main():
    spark = get_spark(cores=int(os.environ.get("CPUS", "32")), app_name="exp-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    variants = {"v0": v0, "v1": v1, "v2": v2, "v3": v3}
    # correctness: all variants agree with v0
    ref = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 4)) for r in v0(docs).collect()
    )
    for name, fn in variants.items():
        got = sorted((r.id_a, r.id_b, round(r.jaccard, 4)) for r in fn(docs).collect())
        if got != ref:
            print(json.dumps({"variant": name, "MISMATCH": True,
                              "n_ref": len(ref), "n_got": len(got)}))
    # warmup already done by the correctness pass; interleaved min-of-k
    rounds = int(os.environ.get("ROUNDS", "4"))
    samples = {name: [] for name in variants}
    for _ in range(rounds):
        for name, fn in variants.items():
            t0 = time.time()
            fn(docs).collect()
            samples[name].append(round(time.time() - t0, 3))
    print(json.dumps({
        "min": {n: min(s) for n, s in samples.items()},
        "all": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
