"""Checkpoint/resume with per-partition lineage + metrics (north rule).

Every tier write is committed partition-by-partition; a ``_manifest``
table records (run_id, partition, rows, bytes, wall_ms, snapshot).
Restart = anti-join pending partitions against the manifest — only
uncommitted partitions recompute.  This is the parquet-backed stand-in
for per-partition Iceberg snapshot checkpoints (no Iceberg catalog jars
in this sandbox; the write path is isolated here so swapping
``_write_partition`` to ``writeTo(...).append()`` + snapshot-id capture
is a one-function change).

Scale notes: partitions are calendar days (matching the production
Iceberg partitioning days(ts), SURVEY §1.4), so the unit of restart is
a bounded, independently-writable slice; the manifest itself is tiny
(one row per partition per run).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "run_id string, partition string, rows long, bytes long, "
    "wall_ms long, committed_seq long"
)


class CheckpointedWriter:
    """Partition-at-a-time committed writes with resume.

    >>> w = CheckpointedWriter(spark, "/data/features_1h")
    >>> w.run(tier_df, partition_col="bucket_start")   # day slices
    Re-running after a crash skips partitions already in the manifest.
    """

    def __init__(self, spark: SparkSession, root: str,
                 run_id: str | None = None) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.manifest_dir = f"{self.root}/_manifest"
        self.run_id = run_id or uuid.uuid4().hex[:12]

    # -- manifest ---------------------------------------------------------
    def completed(self) -> set[str]:
        if not os.path.exists(self.manifest_dir):
            return set()
        rows = (
            self.spark.read.json(self.manifest_dir)
            .select("partition")
            .distinct()
            .collect()
        )
        return {r["partition"] for r in rows}

    def _append_manifest(self, entry: dict) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        fname = f"{self.manifest_dir}/{entry['partition']}-{self.run_id}.json"
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(entry) + "\n")
        os.rename(tmp, fname)  # atomic commit point

    def metrics(self) -> DataFrame:
        """Lineage/metrics table for observability dashboards."""
        return self.spark.read.json(self.manifest_dir)

    # -- write ------------------------------------------------------------
    def run(self, df: DataFrame, partition_col: str = "bucket_start",
            granularity: str = "day") -> list[dict]:
        """Write ``df`` sliced by ``date_trunc(granularity,
        partition_col)``; each slice commits atomically (data files
        first, manifest entry last).  Returns committed entries."""
        part = F.date_format(
            F.date_trunc(granularity, F.col(partition_col)), "yyyy-MM-dd"
        ).alias("_part")
        parts = [r["_part"] for r in df.select(part).distinct().collect()]
        done = self.completed()
        pending = sorted(p for p in parts if p not in done)
        committed: list[dict] = []
        for seq, p in enumerate(pending):
            t0 = time.perf_counter()
            slice_df = df.filter(part == p)
            out_dir = f"{self.root}/part={p}"
            slice_df.write.mode("overwrite").parquet(out_dir)
            rows = self.spark.read.parquet(out_dir).count()
            nbytes = sum(
                os.path.getsize(os.path.join(out_dir, f))
                for f in os.listdir(out_dir)
                if f.endswith(".parquet")
            )
            entry = {
                "run_id": self.run_id,
                "partition": p,
                "rows": rows,
                "bytes": nbytes,
                "wall_ms": int(1000 * (time.perf_counter() - t0)),
                "committed_seq": seq,
            }
            self._append_manifest(entry)
            committed.append(entry)
        return committed

    def read(self) -> DataFrame:
        """Read back only committed partitions."""
        done = sorted(self.completed())
        paths = [f"{self.root}/part={p}" for p in done]
        if not paths:
            raise FileNotFoundError(f"no committed partitions under {self.root}")
        return self.spark.read.parquet(*paths)
