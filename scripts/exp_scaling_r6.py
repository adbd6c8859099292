#!/usr/bin/env python
"""Scaling-leg experiment: one child at local[N] with conf overrides.

Usage: taskset -c 0-7 python scripts/exp_scaling_r6.py 8 <images_path> \
          [key=val ...]
Prints JSON {cores, confs, n_scan_partitions, times}.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    images_path = sys.argv[2]
    extra = {}
    for kv in sys.argv[3:]:
        k, v = kv.split("=", 1)
        extra[k] = v

    from bench import build_pipeline
    from gchq_data_quality_spark.sources.session import get_spark

    spark = get_spark(cores=cores, app_name=f"exp-scaling-{cores}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    images = spark.read.parquet(images_path)
    n_parts = images.rdd.getNumPartitions()

    pipe = build_pipeline()

    def run() -> float:
        t0 = time.time()
        annotated = pipe.annotate(spark.read.parquet(images_path))
        annotated.agg(
            F.sum(F.col("keep").cast("long")),
            F.count(F.lit(1)),
            F.sum(F.length("caption_scrubbed")),
            F.sum(F.col("ppl")),
            F.count_distinct("lang"),
        ).collect()
        return round(time.time() - t0, 3)

    run()  # warmup
    times = [run(), run()]
    print(json.dumps({
        "cores": cores, "confs": extra, "n_scan_partitions": n_parts,
        "times": times, "min": min(times),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
