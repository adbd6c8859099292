"""Experiment: headline write-path cost (VERDICT r4 Next #2).

The headline = annotate + parquet write (bytes passthrough) + audit of the
written files. write_sec dominates (r4 driver: 2.19 of 2.57 s). Variants:

- base          : current (64 input partitions -> 64 output files, snappy)
- coalesce32    : coalesce to one file per core (fewer commits, same
                  parallelism since 32 >= cores... wait 32 = cores, single
                  wave, half the files)
- coalesce16    : 16 files (bigger files, 2-wave compute? no — coalesce
                  merges upstream partitions, compute runs on 16 cores)
- repart32      : round-robin repartition to 32 (adds a shuffle of the
                  payload but keeps compute at full width)
- zstd / none / lz4 : output codec (synthetic image bytes are pseudo-random
                  -> snappy CPU may be pure waste)
Interleaved min-of-k; one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from gchq_data_quality_spark.sources.session import get_spark  # noqa: E402

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

IMAGES = os.environ.get("IMAGES", "/tmp/spark_graft_bench/images_50000.parquet")
OUT = "/tmp/spark_graft_bench/exp_write_out"


def timed_write(spark, pipe, images_path, out_path, shape=None, codec=None):
    images = spark.read.parquet(images_path)
    t0 = time.time()
    annotated = pipe.annotate(images)
    if shape == "coalesce32":
        annotated = annotated.coalesce(32)
    elif shape == "coalesce16":
        annotated = annotated.coalesce(16)
    elif shape == "repart32":
        annotated = annotated.repartition(32)
    w = annotated.write.mode("overwrite")
    if codec:
        w = w.option("compression", codec)
    w.parquet(out_path)
    write_sec = time.time() - t0
    t1 = time.time()
    report = pipe.audit(spark.read.parquet(out_path))
    audit_sec = time.time() - t1
    assert report.results
    return write_sec, audit_sec


def main():
    spark = get_spark(cores=int(os.environ.get("CPUS", "32")), app_name="exp-write")
    spark.sparkContext.setLogLevel("ERROR")
    pipe = bench.build_pipeline()
    variants = {
        "base": {},
        "coalesce32": {"shape": "coalesce32"},
        "coalesce16": {"shape": "coalesce16"},
        "repart32": {"shape": "repart32"},
        "zstd": {"codec": "zstd"},
        "none": {"codec": "uncompressed"},
        "coalesce32_none": {"shape": "coalesce32", "codec": "uncompressed"},
    }
    # warmup
    timed_write(spark, pipe, IMAGES, OUT)
    rounds = int(os.environ.get("ROUNDS", "4"))
    samples = {n: [] for n in variants}
    controls = []
    for _ in range(rounds):
        t0 = time.time()
        spark.range(2_000_000_000).selectExpr("sum(id % 1000)").collect()
        controls.append(round(time.time() - t0, 3))
        for name, kw in variants.items():
            ws, aus = timed_write(spark, pipe, IMAGES, OUT, **kw)
            samples[name].append((round(ws, 3), round(aus, 3)))
    print(json.dumps({
        "min_write": {n: min(s)[0] for n, s in samples.items()},
        "min_total": {n: min(w + a for w, a in s) for n, s in samples.items()},
        "control_sec": min(controls),
        "controls": controls,
        "all": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
