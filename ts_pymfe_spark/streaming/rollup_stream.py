"""Structured Streaming tier maintenance: continuous aggregates kept
fresh as transcript turns arrive.

Design: **stateless partial vectors + merge-on-read** — each microbatch
computes plain per-(conv, series, bucket) moment vectors for JUST its
rows (no streaming state, no watermark-dropped late data) and appends
them as partials; reading a tier finishes the merge with the same
associative ``moment_merge_aggs`` the batch cascade uses.  Late or
out-of-order turns simply add another partial to their bucket — exact
regardless of arrival order, the same property that makes the batch
cascade salt-safe.

A watermarked windowed variant (``streaming_rollup_1m_watermarked``) is
also provided for bounded-state pipelines where late data past the
horizon may be dropped by contract.

At production scale the source is Kafka/Iceberg CDC and the partial
store is an Iceberg table compacted periodically (merge partials into
one row per bucket — same aggregation, run as maintenance); here a file
source with ``availableNow`` triggers serves tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_pymfe_spark.functions.moments import moment_aggs, moment_merge_aggs
from ts_pymfe_spark.operators.derive import derive_series
from ts_pymfe_spark.operators.rollup import KEY, TIERS
from ts_pymfe_spark.synth import TURNS_SCHEMA


def stream_turns(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_rollup_1m_watermarked(turns_stream: DataFrame,
                                    watermark: str = "10 minutes") -> DataFrame:
    """Stateful windowed variant: bounded state via watermark; late data
    beyond the horizon is dropped (append-mode contract)."""
    series = derive_series(turns_stream).withWatermark("ts", watermark)
    return (
        series.groupBy("conv_id", "series", F.window("ts", "1 minute"))
        .agg(*moment_aggs("value", "ts"))
        .withColumn("bucket_start", F.col("window.start"))
        .drop("window")
    )


def run_stream_to_store(spark: SparkSession, input_dir: str, store_dir: str,
                        checkpoint_dir: str,
                        max_files_per_trigger: int = 8) -> None:
    """availableNow streaming job: per-batch partial moment vectors
    appended per tier; exactly-once batch tracking via the streaming
    checkpoint (a replayed batch overwrites its own deterministic
    subdirectory, keeping appends idempotent)."""

    def merge_batch(batch_turns: DataFrame, batch_id: int) -> None:
        series = derive_series(batch_turns)
        t1m = (
            series.select(
                "conv_id", "series", "ts", "value",
                F.date_trunc(TIERS["1m"], "ts").alias("bucket_start"),
            )
            .groupBy(*KEY)
            .agg(*moment_aggs("value", "ts"))
        )
        t1m = t1m.persist()
        try:
            t1m.write.mode("overwrite").parquet(
                f"{store_dir}/tier=1m/batch={batch_id}"
            )
            up = t1m
            for tier in ("1h", "1d"):
                up = (
                    up.withColumn(
                        "bucket_start", F.date_trunc(TIERS[tier], "bucket_start")
                    )
                    .groupBy(*KEY)
                    .agg(*moment_merge_aggs())
                )
                up.write.mode("overwrite").parquet(
                    f"{store_dir}/tier={tier}/batch={batch_id}"
                )
        finally:
            t1m.unpersist()

    q = (
        stream_turns(spark, input_dir, max_files_per_trigger)
        .writeStream.option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .foreachBatch(merge_batch)
        .start()
    )
    q.awaitTermination()


def _live_batch_dirs(store_dir: str, tier: str) -> list[str]:
    """Batch partial dirs that are not retention-tombstoned."""
    import os

    root = f"{store_dir}/tier={tier}"
    dead = set()
    ret = f"{root}/_retention"
    if os.path.isdir(ret):
        dead = {f[: -len(".json")] for f in os.listdir(ret)
                if f.endswith(".json")}
    return [
        f"{root}/{d}" for d in sorted(os.listdir(root))
        if d.startswith("batch=") and d not in dead
    ]


def read_tier(spark: SparkSession, store_dir: str, tier: str) -> DataFrame:
    """Merge-on-read: combine per-batch partial vectors into final
    bucket vectors — identical algebra to the batch cascade, so
    streaming output == batch output exactly.  Retention-tombstoned
    batch dirs are excluded even if a crash left them on disk.

    Fails loudly on a compacted store (ADVICE r5): once
    ``compact_stream_store`` has swept batch dirs behind the
    ``_compacted_until`` marker, the partials alone are TRUNCATED
    history — a stale caller must switch to ``read_tier_compacted``
    rather than silently get only the newest buckets."""
    marker = _compaction_marker(store_dir, tier)
    if marker is not None:
        raise RuntimeError(
            f"tier {tier!r} under {store_dir} is compacted up to "
            f"{marker}: read_tier would return truncated history — "
            "use read_tier_compacted(spark, store_dir, compact_dir, "
            "tier) instead"
        )
    paths = _live_batch_dirs(store_dir, tier)
    if not paths:
        raise FileNotFoundError(
            f"no live batch partials under {store_dir}/tier={tier}"
        )
    return (
        spark.read.parquet(*paths)
        .groupBy(*KEY)
        .agg(*moment_merge_aggs())
    )


def _batch_max_bucket(batch_dir: str):
    """Max ``bucket_start`` across a batch dir, from parquet FOOTER
    row-group statistics — no data read (same principle as
    plans/manifest._footer_stats)."""
    import os

    import pyarrow.parquet as pq

    mx = None
    for f in os.listdir(batch_dir):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(batch_dir, f)).metadata
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema != "bucket_start":
                    continue
                st = col.statistics
                if st is not None and st.has_min_max:
                    mx = st.max if mx is None else max(mx, st.max)
    return mx


def _compaction_marker(store_dir: str, tier: str) -> str | None:
    """The compaction watermark: buckets strictly older than this
    YYYY-MM-DD live in the compacted store, not the partials."""
    import json as _json
    import os

    path = f"{store_dir}/tier={tier}/_compacted_until.json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return _json.load(f)["older_than"]


def compact_stream_store(spark: SparkSession, store_dir: str,
                         compact_dir: str, tier: str, older_than: str,
                         run_id: str | None = None) -> list[dict]:
    """Compact streamed partials older than ``older_than`` into the
    day-partitioned checkpointed layout (round 5) — the production
    maintenance pass the partial store's design assumes: without it
    merge-on-read degrades as O(#batches) and retention can only drop
    whole batches.

    Mechanics (exactly-once via the marker as the atomic switch):

      1. live partials are filtered to ``bucket_start < older_than``,
         merged with the same associative ``moment_merge_aggs`` a
         read would apply, and committed day-partitioned through
         ``CheckpointedWriter`` (resume-safe: already-committed days
         are skipped on a re-run);
      2. the ``_compacted_until.json`` marker is advanced (atomic
         rename) — from this instant ``read_tier_compacted`` takes
         old buckets from the compacted store and keeps reading the
         partials only for buckets >= the marker, so a batch that
         straddles the cutoff is never double-counted;
      3. batch dirs whose footer max(bucket_start) is strictly older
         than the marker are deleted — every row they held is in the
         compacted store.  A crash before this step leaves garbage
         the marker filter already hides; the next pass sweeps it.

    Contract: ``older_than`` is a watermark — rows older than an
    already-advanced marker must not arrive in later batches (a real
    deployment routes such stragglers through a late lane).  Returns
    the manifest entries committed by this call."""
    import datetime as _dt
    import json as _json
    import os
    import shutil

    from ts_pymfe_spark.plans.manifest import CheckpointedWriter

    prev = _compaction_marker(store_dir, tier)
    if prev is not None and older_than < prev:
        raise ValueError(
            f"compaction marker cannot move backwards: {older_than} < {prev}"
        )
    paths = _live_batch_dirs(store_dir, tier)
    w = CheckpointedWriter(spark, f"{compact_dir}/tier={tier}",
                           run_id=run_id)
    committed: list[dict] = []
    if paths:
        merged_old = (
            spark.read.parquet(*paths)
            .filter(F.col("bucket_start") < F.lit(older_than))
            .groupBy(*KEY)
            .agg(*moment_merge_aggs())
        )
        committed = w.run(merged_old, "bucket_start", "day")
    # advance the marker (atomic commit point of the read switch)
    marker = f"{store_dir}/tier={tier}/_compacted_until.json"
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(_json.dumps({"older_than": older_than}) + "\n")
    os.rename(tmp, marker)
    # sweep batch dirs now fully represented in the compacted store
    cutoff = _dt.date.fromisoformat(older_than)
    for path in _live_batch_dirs(store_dir, tier):
        mx = _batch_max_bucket(path)
        if mx is not None and mx.date() < cutoff:
            shutil.rmtree(path, ignore_errors=True)
    return committed


def read_tier_compacted(spark: SparkSession, store_dir: str,
                        compact_dir: str, tier: str) -> DataFrame:
    """Union view over the compacted store and the live partials —
    the reader for a compacted streaming tier.  The marker decides
    the split: compacted rows are final vectors for buckets strictly
    older than it; partial rows at or after it still merge on read.
    The two sides' keys are disjoint by construction, so the union
    needs no further aggregation."""
    from ts_pymfe_spark.plans.manifest import CheckpointedWriter

    marker = _compaction_marker(store_dir, tier)
    if marker is None:
        return read_tier(spark, store_dir, tier)
    paths = _live_batch_dirs(store_dir, tier)
    fresh = None
    if paths:
        fresh = (
            spark.read.parquet(*paths)
            .filter(F.col("bucket_start") >= F.lit(marker))
            .groupBy(*KEY)
            .agg(*moment_merge_aggs())
        )
    try:
        old = CheckpointedWriter(
            spark, f"{compact_dir}/tier={tier}"
        ).read().filter(F.col("bucket_start") < F.lit(marker))
    except FileNotFoundError:
        # marker advanced but nothing was old enough to compact yet
        old = None
    if old is None and fresh is None:
        raise FileNotFoundError(
            f"no data in either store for tier={tier}"
        )
    if old is None:
        return fresh
    return old if fresh is None else old.unionByName(fresh)


def apply_stream_retention(store_dir: str, tier: str,
                           older_than: str,
                           dry_run: bool = False) -> list[str]:
    """Retention for the streamed partial store (round 5 — the batch
    ladder's ``manifest.apply_retention`` counterpart; without it the
    partial store grows unboundedly).

    A ``batch=N`` partial dir is expired when EVERY row in it is
    strictly older than ``older_than`` (YYYY-MM-DD) — decided from the
    parquet footer max of ``bucket_start``, no data read.  Batches
    that straddle the cutoff are conservatively kept (partial vectors
    cannot be row-filtered without rewriting the batch; periodic
    compaction into day partitions is the production path for those).

    Crash-safe ordering mirrors the batch ladder: the tombstone
    (``_retention/batch=N.json``) commits FIRST via atomic rename,
    then the directory is deleted.  A crash in between leaves a
    tombstoned-but-present orphan: ``read_tier`` already excludes it,
    and the next retention pass sweeps it.  Returns newly expired
    batch dir names."""
    import datetime as _dt
    import json as _json
    import os
    import shutil

    cutoff = _dt.date.fromisoformat(older_than)
    root = f"{store_dir}/tier={tier}"
    ret = f"{root}/_retention"
    victims = []
    for path in _live_batch_dirs(store_dir, tier):
        mx = _batch_max_bucket(path)
        if mx is not None and mx.date() < cutoff:
            victims.append(os.path.basename(path))
    if dry_run:
        return victims
    os.makedirs(ret, exist_ok=True)
    for b in victims:
        fname = f"{ret}/{b}.json"
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            f.write(_json.dumps(
                {"batch": b, "expired": True, "older_than": older_than}
            ) + "\n")
        os.rename(tmp, fname)  # atomic tombstone commit point
    # sweep: newly expired dirs AND orphans from a crashed prior pass
    dead = {f[: -len(".json")] for f in os.listdir(ret)
            if f.endswith(".json")}
    for b in sorted(dead):
        shutil.rmtree(f"{root}/{b}", ignore_errors=True)
    return victims


def read_all_tiers(spark: SparkSession, store_dir: str,
                   include_turn_rate: bool = True) -> dict[str, DataFrame]:
    """Merge-on-read composition of the FULL cascade over a streaming
    partial store — the streaming counterpart of
    ``rollup.build_all_tiers`` (round-4 parity closure).

    The emergent turn-rate series cannot be maintained as per-batch
    partials: its VALUE is the merged 1m bucket count ``n``, and
    moments of n are not mergeable from moments of per-batch partial
    counts (s2 of 5 is not s2 of 3 plus s2 of 2).  It is therefore
    derived here, AFTER the 1m merge — the same read-time aggregation
    the batch cascade performs, so streaming output == batch output
    exactly (tests/test_plans_streaming.py::
    test_streaming_full_cascade_matches_batch).
    """
    from functools import reduce

    from ts_pymfe_spark.operators.rollup import (
        cascade,
        rate_1m_projection,
    )

    def _union(dfs):
        return reduce(lambda a, b: a.unionByName(b), dfs)

    t1m = read_tier(spark, store_dir, "1m")
    branches = [t1m]
    if include_turn_rate:
        # identity-bucket rollup as a projection (round 7, rollup.py)
        branches.append(rate_1m_projection(t1m))
    tiers = {"1m": _union(branches)}
    branches_1h = [cascade(b, "1h") for b in branches]
    tiers["1h"] = _union(branches_1h)
    tiers["1d"] = _union([cascade(b, "1d") for b in branches_1h])
    return tiers


# ---------------------------------------------------------------------------
# streaming HLL sketch maintenance (round 5): same partials +
# merge-on-read contract as the moment tiers — each microbatch appends
# its own register table; a read max-merges them.  Exact regardless of
# arrival order (max is associative/commutative/idempotent-per-value),
# so late data needs no watermark and replays are idempotent (a batch
# overwrites its own deterministic subdirectory).
# ---------------------------------------------------------------------------

def run_hll_stream_to_store(spark: SparkSession, input_dir: str,
                            store_dir: str, checkpoint_dir: str,
                            value_col: str = "conv_id", p: int = 10,
                            max_files_per_trigger: int = 8) -> None:
    """availableNow streaming job: per-batch daily HLL register
    partials for ``value_col`` appended under ``store_dir``."""
    from ts_pymfe_spark.operators.sketches import hll_sketch

    def sketch_batch(batch_turns: DataFrame, batch_id: int) -> None:
        ev = batch_turns.select(F.to_date("ts").alias("day"), value_col)
        sk = hll_sketch(ev, ["day"], value_col, p=p)
        sk.write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}")

    q = (
        stream_turns(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_hll_sketch(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read of the streamed register partials: one max per
    (day, register) — feed to ``hll_estimate``/``hll_rolling``."""
    from ts_pymfe_spark.operators.sketches import hll_merge

    # `batch` is the partition-discovery column of the store layout,
    # not a sketch key — keeping it would merge per-batch, not across
    return hll_merge(spark.read.parquet(store_dir).drop("batch"))


def run_hist_stream_to_store(spark: SparkSession, input_dir: str,
                             store_dir: str, checkpoint_dir: str,
                             value_col: str = "turn_idx",
                             lo: float = 0.0, hi: float = 200.0,
                             bins: int = 100,
                             max_files_per_trigger: int = 8) -> None:
    """availableNow streaming job: per-batch daily histogram-sketch
    partials (sum-mergeable bin counts — the histogram's analogue of
    the HLL partials above and the moment partials in
    run_stream_to_store)."""
    from ts_pymfe_spark.operators.histogram import histogram_sketch

    def sketch_batch(batch_turns: DataFrame, batch_id: int) -> None:
        ev = batch_turns.select(F.to_date("ts").alias("day"), value_col)
        sk = histogram_sketch(ev, ["day"], value_col, lo, hi, bins)
        sk.write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}")

    q = (
        stream_turns(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_hist_sketch(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read of streamed histogram partials (sum per (day,
    bin)) — feed to ``histogram_quantile``."""
    from ts_pymfe_spark.operators.histogram import histogram_merge

    return histogram_merge(spark.read.parquet(store_dir).drop("batch"))


def run_cms_stream_to_store(spark: SparkSession, input_dir: str,
                            store_dir: str, checkpoint_dir: str,
                            value_col: str = "conv_id", d: int = 4,
                            w: int = 2048,
                            max_files_per_trigger: int = 8) -> None:
    """availableNow streaming job: per-batch count-min counter
    partials for ``value_col`` appended under ``store_dir`` — the
    frequency analogue of the HLL partials above (counters SUM-merge,
    registers MAX-merge; both stores are O(sketch), never O(rows))."""
    from ts_pymfe_spark.operators.sketches import cms_sketch

    def sketch_batch(batch_turns: DataFrame, batch_id: int) -> None:
        sk = cms_sketch(batch_turns, value_col, d=d, w=w)
        sk.write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}")

    q = (
        stream_turns(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_cms_sketch(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read of the streamed counter partials (sum per
    (row, bucket)) — feed to ``cms_estimate``/point queries."""
    from ts_pymfe_spark.operators.sketches import cms_merge

    return cms_merge(spark.read.parquet(store_dir).drop("batch"))


def run_health_stream_to_store(spark: SparkSession, input_dir: str,
                               store_dir: str, checkpoint_dir: str,
                               cols: tuple = ("value",),
                               max_files_per_trigger: int = 8) -> None:
    """availableNow streaming job: per-batch daily column-health
    partials (drift.daily_health_partials — sum/min/max-mergeable,
    the moments-store shape) appended under ``store_dir``.  Merge-on-
    read via ``read_daily_health`` yields drift.daily_drift's exact
    output schema without ever re-scanning events.

    Unlike the turn-schema maintainers above, the health stream is
    column-generic (events, turns, any table with ``ts`` + numeric
    columns), so the stream schema is sniffed from the input's own
    parquet footers (one metadata read, no data scan)."""
    from ts_pymfe_spark.operators.drift import daily_health_partials

    schema = spark.read.parquet(input_dir).schema

    def health_batch(batch_turns: DataFrame, batch_id: int) -> None:
        hp = daily_health_partials(batch_turns, cols=cols)
        hp.write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(health_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_daily_health(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read of the streamed health partials -> the
    daily_drift output schema (day, col_name, n, n_null, null_frac,
    mean_v, min_v, max_v, dod_mean_delta)."""
    from ts_pymfe_spark.operators.drift import daily_health_from_partials

    return daily_health_from_partials(
        spark.read.parquet(store_dir).drop("batch"))


def run_drift_cells_to_store(spark: SparkSession, input_dir: str,
                             store_dir: str, checkpoint_dir: str,
                             bounds: dict, grp_col: str = "user_id",
                             key: str = "event_type",
                             value_col: str = "value", bins: int = 256,
                             max_files_per_trigger: int = 8) -> None:
    """availableNow streaming job: per-batch two-population drift
    cells (drift.drift_cells — FIXED bounds so batches sum-merge)
    appended under ``store_dir``.  ``bounds`` maps key -> (lo, hi):
    the pinned baseline contract.  Merge-on-read via
    ``read_drift_cells`` feeds ``ks_from_cells``/``psi_from_cells`` —
    a continuously maintained drift monitor that never re-scans
    events."""
    from pyspark.sql import functions as SF

    from ts_pymfe_spark.operators.drift import drift_cells

    schema = spark.read.parquet(input_dir).schema
    bdf = spark.createDataFrame(
        [(k, float(lo), float(hi)) for k, (lo, hi) in bounds.items()],
        f"{key} string, lo double, hi double")

    def cells_batch(batch: DataFrame, batch_id: int) -> None:
        c = drift_cells(batch, SF.col(grp_col) % 2, bdf, key=key,
                        value_col=value_col, bins=bins)
        c.write.mode("overwrite").parquet(f"{store_dir}/batch={batch_id}")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(cells_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_drift_cells(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge-on-read of streamed drift cells (sum per (key, cell))."""
    from ts_pymfe_spark.operators.drift import drift_cells_merge

    return drift_cells_merge(spark.read.parquet(store_dir).drop("batch"))
