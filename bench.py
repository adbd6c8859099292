#!/usr/bin/env python
"""Benchmark harness: headline quality-filter throughput + query timings.

Prints ONE JSON line:
  {"metric": "pipeline_total_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "images_per_sec": ..., "n_images": ...,
   "scaling": {"cores_lo": .., "lo_sec": .., "cores_hi": .., "hi_sec": ..,
               "lo_images_per_sec": .., "hi_images_per_sec": ..,
               "efficiency": ..}}

Headline = the north-rule metric: images/sec filtered + scrubbed (pipeline
annotate -> parquet write + audit aggregation) over the synthetic
image+caption table. The scaling section evidences the N -> 4N criterion by
running the same job at local[lo] and local[hi] in fresh subprocesses
(BASELINE.md: sandbox proxy for two cluster sizes).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SCALING=0 to skip scaling runs.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

BENCH_DIR = Path(os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/spark_graft_bench"))


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def n_images_for_sf(sf: float) -> int:
    return max(int(500_000 * sf), 1000)


def ensure_images_parquet(spark, n_images: int) -> str:
    """Generate (once, cached) the deterministic image+caption table."""
    path = BENCH_DIR / f"images_{n_images}.parquet"
    marker = BENCH_DIR / f"images_{n_images}.done"
    if not marker.exists():
        from gchq_data_quality_spark.sources.synthetic import generate_images_df

        df = generate_images_df(spark, n_images, n_partitions=64)
        df.write.mode("overwrite").parquet(str(path))
        marker.touch()
    return str(path)


def build_pipeline():
    from gchq_data_quality_spark.functions.langid import train_langid
    from gchq_data_quality_spark.functions.perplexity import train_perplexity
    from gchq_data_quality_spark.pipeline import QualityFilterConfig, QualityFilterPipeline
    from gchq_data_quality_spark.sources.synthetic import LANGUAGES, training_corpus

    texts, labels = training_corpus()
    return QualityFilterPipeline(
        QualityFilterConfig(allowed_langs=LANGUAGES),
        train_langid(texts, labels),
        train_perplexity(texts),
    )


def run_pipeline_once(spark, images_path: str, out_path: str) -> dict:
    """Filtered+scrubbed output write + audit agg; returns timings."""
    pipe = build_pipeline()
    images = spark.read.parquet(images_path)
    t0 = time.time()
    annotated = pipe.annotate(images)
    kept = annotated.filter("keep").select(
        "image_id", "bytes", "w", "h", "fmt", "caption_scrubbed", "phash"
    )
    kept.write.mode("overwrite").parquet(out_path)
    write_sec = time.time() - t0
    t1 = time.time()
    report = pipe.audit(annotated)
    audit_sec = time.time() - t1
    n_rules = len(report.results)
    return {"write_sec": write_sec, "audit_sec": audit_sec,
            "total_sec": write_sec + audit_sec, "n_rules": n_rules}


def scaling_child(cores: int, images_path: str) -> None:
    """Subprocess entry: run the pipeline at local[cores], print JSON."""
    from gchq_data_quality_spark.sources.session import get_spark

    spark = get_spark(cores=cores, app_name=f"bench-scaling-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    out = str(BENCH_DIR / f"scaling_out_{cores}")
    timings = run_pipeline_once(spark, images_path, out)
    print(json.dumps({"cores": cores, **timings}))
    spark.stop()


def run_scaling(images_path: str, lo: int, hi: int) -> dict:
    results = {}
    for cores in (lo, hi):
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-run", str(cores), images_path],
            capture_output=True, text=True, timeout=3600,
        )
        last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not last:
            raise RuntimeError(f"scaling run {cores} failed: {proc.stderr[-2000:]}")
        results[cores] = json.loads(last[-1])
    return results


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Time a representative slice of the queries() surface at sf_dir."""
    import __spark_entry__ as entry_mod

    picks = [
        "rules_single_pass",
        "tpch_pricing_summary",
        "segment_revenue",
        "text_stats_by_lang",
        "dedup_exact",
        "doc_quality_flags",
        "embedding_topk",
        "minhash_candidates",
    ]
    queries = entry_mod.queries()
    timings = {}
    for name in picks:
        t0 = time.time()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
    return timings


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-run":
        scaling_child(int(sys.argv[2]), sys.argv[3])
        return

    from gchq_data_quality_spark.sources.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_from_dir(sf_dir)
    n_images = n_images_for_sf(sf)
    BENCH_DIR.mkdir(parents=True, exist_ok=True)

    spark = get_spark(cores=cpus, app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    images_path = ensure_images_parquet(spark, n_images)

    # warm-up (JVM/codegen) on a small slice, then the measured run
    run_pipeline_once(spark, images_path, str(BENCH_DIR / "warmup_out"))
    headline = run_pipeline_once(spark, images_path, str(BENCH_DIR / "main_out"))
    queries = bench_queries(spark, sf_dir)
    spark.stop()

    result = {
        "metric": "pipeline_total_sec",
        "value": round(headline["total_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_images": n_images,
        "images_per_sec": round(n_images / headline["total_sec"], 1),
        "pipeline": {k: round(v, 3) for k, v in headline.items() if k != "n_rules"},
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        lo, hi = 8, cpus if cpus > 8 else 32
        scaling = run_scaling(images_path, lo, hi)
        lo_sec = scaling[lo]["total_sec"]
        hi_sec = scaling[hi]["total_sec"]
        speedup = lo_sec / hi_sec
        result["scaling"] = {
            "cores_lo": lo,
            "cores_hi": hi,
            "lo_sec": round(lo_sec, 3),
            "hi_sec": round(hi_sec, 3),
            "lo_images_per_sec": round(n_images / lo_sec, 1),
            "hi_images_per_sec": round(n_images / hi_sec, 1),
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (hi / lo), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
