#!/usr/bin/env python
"""Headline write+audit experiment with conf overrides.

Usage: python scripts/exp_headline_r6.py [key=val ...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    extra = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        extra[k] = v

    from bench import build_pipeline, run_pipeline_once
    from gchq_data_quality_spark.sources.session import get_spark

    spark = get_spark(cores=32, app_name="exp-headline", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    images_path = "/tmp/spark_graft_bench/images_50000.parquet"
    out = "/tmp/spark_graft_bench/exp_headline_out"

    run_pipeline_once(spark, images_path, out)  # warmup
    samples = [run_pipeline_once(spark, images_path, out) for _ in range(4)]
    best = min(samples, key=lambda h: h["total_sec"])
    print(json.dumps({
        "confs": extra,
        "best": {k: round(v, 3) for k, v in best.items()},
        "all_total": [round(h["total_sec"], 3) for h in samples],
        "n_scan_partitions": spark.read.parquet(images_path).rdd.getNumPartitions(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
