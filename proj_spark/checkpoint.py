"""Resumable per-partition checkpointing with lineage + metrics.

North-rule requirement: jobs over the pages table must be "resumable from
per-partition checkpoints with lineage + metrics recorded per Iceberg
snapshot". This container has no Iceberg catalog, so the same contract is
implemented over a parquet directory tree with an explicit JSON manifest —
the manifest entry is exactly what an Iceberg snapshot summary would carry
(snapshot-per-bucket commit; swap `_commit_bucket` for `df.writeTo(...)
.append()` + snapshot properties on a real catalog).

Model: the input keyspace is split into ``n_buckets`` deterministic hash
buckets (``pmod(xxhash64(key), n)``). Each bucket is processed
independently and committed atomically (tmp dir -> rename). A rerun skips
committed buckets, so kill-and-rerun converges to the single-run output —
asserted by tests/test_checkpoint.py including an order-independent
xor-of-row-hashes fingerprint.

Manifest entry per bucket (lineage + metrics):
  bucket, input_rows, output_rows, output_xor_hash, wall_s,
  input_path, code_version (git-free content hash of the job closure's
  description), committed_at_monotonic
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, functions as F


class CheckpointedJob:
    def __init__(self, name: str, out_dir: str, n_buckets: int,
                 key_col: str, job_desc: str = ""):
        self.name = name
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.key_col = key_col
        self.code_version = hashlib.md5(job_desc.encode()).hexdigest()[:12]
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "_manifest.json")

    # -- manifest ---------------------------------------------------------

    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"name": self.name, "n_buckets": self.n_buckets,
                "code_version": self.code_version, "buckets": {}}

    def _save_manifest(self, m: dict):
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def completed_buckets(self) -> set[int]:
        return {int(b) for b in self._load_manifest()["buckets"]}

    # -- run --------------------------------------------------------------

    def run(self, input_df: DataFrame, transform, input_path: str = "",
            max_buckets: int | None = None) -> int:
        """Process every not-yet-committed bucket. ``transform`` maps a
        bucket DataFrame -> output DataFrame. ``max_buckets`` limits how
        many buckets to process this invocation (used by the kill-and-rerun
        test; a real job dying mid-bucket leaves only an uncommitted tmp
        dir, which the rerun clobbers). Returns #buckets processed."""
        bucket_col = F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets))
        keyed = input_df.withColumn("_bucket", bucket_col)
        done = self.completed_buckets()
        processed = 0
        for b in range(self.n_buckets):
            if b in done:
                continue
            if max_buckets is not None and processed >= max_buckets:
                break
            self._run_bucket(keyed, transform, b, input_path)
            processed += 1
        return processed

    def _run_bucket(self, keyed: DataFrame, transform, b: int, input_path: str):
        t0 = time.monotonic()
        part = keyed.filter(F.col("_bucket") == b).drop("_bucket")
        in_rows = part.count()
        out = transform(part)
        final_dir = os.path.join(self.out_dir, f"bucket={b}")
        tmp_dir = final_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)  # leftover from a killed run
        out.write.mode("overwrite").parquet(tmp_dir)
        # metrics over the committed files (read back => exactly what a
        # resumed consumer will see)
        spark = out.sparkSession
        written = spark.read.parquet(tmp_dir)
        stats = written.agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64(*written.columns)).alias("xh")).collect()[0]
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)  # atomic commit (Iceberg snapshot analogue)
        m = self._load_manifest()
        m["buckets"][str(b)] = {
            "bucket": b,
            "input_rows": in_rows,
            "output_rows": int(stats["rows"]),
            "output_xor_hash": int(stats["xh"]) if stats["xh"] is not None else 0,
            "wall_s": round(time.monotonic() - t0, 3),
            "input_path": input_path,
            "code_version": self.code_version,
        }
        self._save_manifest(m)

    # -- read -------------------------------------------------------------

    def read_output(self, spark) -> DataFrame:
        done = sorted(self.completed_buckets())
        paths = [os.path.join(self.out_dir, f"bucket={b}") for b in done]
        return spark.read.parquet(*paths)

    def metrics(self) -> dict:
        return self._load_manifest()
