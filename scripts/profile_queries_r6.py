#!/usr/bin/env python
"""r6 profiling harness (bench.py is frozen for measurement — guide §1).

For each benched query: time CONSTRUCTION (python-side Column building +
py4j) separately from EXECUTION (collect), interleaved min-of-k, and dump
.explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage: python scripts/profile_queries_r6.py [tag] [rounds] [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

PICKS = [
    "rules_single_pass",
    "tpch_pricing_summary",
    "segment_revenue",
    "text_stats_by_lang",
    "dedup_exact",
    "doc_token_quality",
    "embedding_topk",
    "minhash_candidates",
    "simhash_pairs",
    "lsh_verified_pairs",
    "asof_time_since_error",
    "orders_nearby_window",
    "dedup_cluster_sizes",
    "value_percentiles_by_type",
    "document_chunks",
    "line_dedup_stats",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    picks = sys.argv[3:] or PICKS

    import __spark_entry__ as entry_mod
    from gchq_data_quality_spark.sources.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="profile-r6")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    plans_dir = Path("/root/repo/plans/r06")
    plans_dir.mkdir(parents=True, exist_ok=True)

    warmup_dir = "/root/testdata/sf0.001"
    for name in picks:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        queries[name](spark, warmup_dir).collect()

    build: dict[str, list[float]] = {n: [] for n in picks}
    execute: dict[str, list[float]] = {n: [] for n in picks}
    for r in range(rounds):
        for name in picks:
            spark.sparkContext.setJobDescription(f"{tag}:{name}:r{r}")
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            build[name].append(round(t1 - t0, 3))
            execute[name].append(round(t2 - t1, 3))
            if r == 0:
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")
                plan = df._jdf.queryExecution().explainString(mode)
                (plans_dir / f"{name}_{tag}.txt").write_text(plan)

    out = {}
    for name in picks:
        tot = [b + e for b, e in zip(build[name], execute[name])]
        out[name] = {
            "total_min": round(min(tot), 3),
            "build_min": min(build[name]),
            "exec_min": min(execute[name]),
            "build_all": build[name],
            "exec_all": execute[name],
        }
    print(json.dumps(out, indent=1))
    Path(f"/tmp/profile_r6_{tag}.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
