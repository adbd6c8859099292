"""Checkpointed, resumable batch runs with per-partition lineage.

Production design (north rule): Iceberg snapshot-based checkpointing —
overwrite-by-partition is atomic per Iceberg commit and the snapshot ID is
the lineage record. Sandbox stand-in with identical semantics: the output is
hash-partitioned into ``n_buckets`` by a stable key; each bucket is written
with dynamic partition overwrite (idempotent — re-running a bucket replaces
exactly its own files), and a JSON manifest records completed buckets plus
row counts (the lineage). ``resume=True`` skips completed buckets.

Determinism: bucket = pmod(xxhash64(key), n_buckets) — a pure function of the
data, so a restarted run processes exactly the rows the failed run missed,
and re-processing a completed bucket cannot double-count.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "dq_bucket"


class CheckpointManifest:
    def __init__(self, path: str):
        self.path = Path(path)

    def load(self) -> dict:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return {"completed": {}, "n_buckets": None}

    def mark_done(
        self, bucket: int, rows: int, elapsed: float, extra: dict | None = None
    ) -> None:
        state = self.load()
        state["completed"][str(bucket)] = {
            "rows": rows,
            "elapsed_sec": round(elapsed, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **(extra or {}),
        }
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(state, indent=2))
        tmp.replace(self.path)

    def set_n_buckets(self, n: int) -> None:
        state = self.load()
        if state["n_buckets"] not in (None, n):
            raise ValueError(
                f"Manifest bucket count {state['n_buckets']} != requested {n}; "
                "use a fresh manifest to change bucketing"
            )
        state["n_buckets"] = n
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(state, indent=2))
        tmp.replace(self.path)

    def set_key_col(self, key_col: str) -> None:
        """Pin the bucketing key. bucket = pmod(xxhash64(key_col), n) is only
        stable across runs if the KEY is stable too: resuming a manifest
        written under a different key (e.g. adding --dedup exact, which
        re-keys buckets by the caption fingerprint, after a partial id-keyed
        run) would silently mix bucketing schemes — completed buckets keyed
        one way are skipped while pending buckets re-key the other way, so
        rows can duplicate across output partitions or escape dedup
        entirely. Mirrors set_n_buckets: raise on mismatch, adopt on a
        legacy manifest that never recorded a key."""
        state = self.load()
        if state.get("key_col") not in (None, key_col):
            raise ValueError(
                f"Manifest bucketing key {state['key_col']!r} != requested "
                f"{key_col!r}; use a fresh manifest to change the bucketing "
                "key (e.g. when toggling --dedup)"
            )
        state["key_col"] = key_col
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(state, indent=2))
        tmp.replace(self.path)

    def completed_buckets(self) -> set[int]:
        return {int(b) for b in self.load()["completed"]}

    # -- job-defined metadata (e.g. per-bucket audit counts) ---------------
    def merge_meta(self, key: str, entries: dict) -> None:
        """Merge ``entries`` into the manifest's ``meta[key]`` mapping.
        Jobs use this to persist per-bucket side data (audit counts) so a
        resumed run can reconstruct whole-dataset aggregates covering the
        buckets it skipped."""
        state = self.load()
        state.setdefault("meta", {}).setdefault(key, {}).update(entries)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(state, indent=2))
        tmp.replace(self.path)

    def get_meta(self, key: str) -> dict:
        return self.load().get("meta", {}).get(key, {})


def run_checkpointed(
    df: DataFrame,
    output_path: str,
    manifest_path: str,
    key_col: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    n_buckets: int = 8,
    buckets_per_batch: int = 2,
    resume: bool = True,
    bucket_meta: dict | None = None,
) -> dict:
    """Process ``df`` in bucket batches, writing partition-by-bucket output.

    ``bucket_meta``: extra fields stamped into every bucket completed by
    THIS run (e.g. the job's ``{"audited": True}`` marker) — written
    atomically with the completion record, so a crash can never leave a
    bucket completed-but-unflagged.

    Returns a summary dict {buckets_run, buckets_skipped, rows_written}.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    manifest = CheckpointManifest(manifest_path)
    manifest.set_n_buckets(n_buckets)
    manifest.set_key_col(key_col)
    done = manifest.completed_buckets() if resume else set()

    bucketed = df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )

    pending = [b for b in range(n_buckets) if b not in done]
    rows_written = 0
    for start in range(0, len(pending), buckets_per_batch):
        batch = pending[start : start + buckets_per_batch]
        t0 = time.time()
        part = bucketed.filter(F.col(BUCKET_COL).isin(batch))
        if transform is not None:
            part = transform(part)
        # zstd to match sources.io.write_table: measured fastest end-to-end
        # on the image-payload write (scripts/exp_write_path.py) and the
        # better ratio for the 100-TB at-rest + downstream-scan cost
        (
            part.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .option("compression", "zstd")
            .parquet(output_path)
        )
        elapsed = time.time() - t0
        # lineage: per-bucket row counts from the files just written
        counts = {
            row[BUCKET_COL]: row["n"]
            for row in spark.read.parquet(output_path)
            .filter(F.col(BUCKET_COL).isin(batch))
            .groupBy(BUCKET_COL)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for b in batch:
            n = int(counts.get(b, 0))
            manifest.mark_done(b, n, elapsed / len(batch), extra=bucket_meta)
            rows_written += n

    return {
        "buckets_run": len(pending),
        "buckets_skipped": len(done),
        "rows_written": rows_written,
    }
