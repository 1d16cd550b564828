"""Bucketized point-in-interval join.

Engine addition (no reference counterpart): joining events to the time
intervals that contain them (maintenance windows, incident spans,
error-burst windows) is a range predicate, and Spark's optimizer plans
``p.ts BETWEEN i.start AND i.end`` with an equi-key as a SortMergeJoin
whose per-key inner side is rescanned per row — or, keyless, as a
BroadcastNestedLoopJoin.  At 100 TB both are fatal.

The scalable form buckets the time axis: each interval is exploded to
the fixed-width buckets it covers, each point maps to exactly ONE
bucket, and the join becomes a plain equi-join on (key, bucket) with
the exact range predicate re-checked after the match.  Amplification
is ``interval_len / bucket_s + 1`` rows per interval — pick bucket_s
near the typical interval length (amplification ~2) and the shuffle is
O(points + intervals), never O(points x intervals).

Exactness: a point's bucket is unique, and an interval appears at most
once per bucket (``sequence`` emits distinct bucket ids), so every
true (point, interval) containment pair is produced exactly once — no
post-join dedup needed.  [start, end] is closed on both ends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, bucket_s: int):
    return F.floor(F.unix_timestamp(col.cast("timestamp")) / bucket_s)


def interval_join(points: DataFrame, intervals: DataFrame,
                  key: str = "user_id", ts_col: str = "ts",
                  start_col: str = "start", end_col: str = "end",
                  bucket_s: int = 300) -> DataFrame:
    """Inner-join each point to every interval (same key) containing
    it: one output row per true containment pair.

    Interval columns come back prefixed ``iv_`` to avoid collisions.
    Plan: equi-join on (key, bucket) — audited in tests to contain no
    CartesianProduct / BroadcastNestedLoopJoin.
    """
    iv = intervals.select(
        F.col(key).alias("_iv_key"),
        *[F.col(c).alias(f"iv_{c}") for c in intervals.columns if c != key],
        F.explode(
            F.sequence(_bucket(F.col(start_col), bucket_s),
                       _bucket(F.col(end_col), bucket_s))
        ).alias("_bucket"),
    )
    pt = points.withColumn("_pt_bucket", _bucket(F.col(ts_col), bucket_s))
    joined = pt.join(
        iv,
        (pt[key] == iv["_iv_key"]) & (pt["_pt_bucket"] == iv["_bucket"]),
    )
    return (
        joined.filter(
            (F.col(ts_col) >= F.col(f"iv_{start_col}"))
            & (F.col(ts_col) <= F.col(f"iv_{end_col}")))
        .drop("_pt_bucket", "_bucket", "_iv_key")
    )


def points_in_intervals(points: DataFrame, intervals: DataFrame,
                        key: str = "user_id", ts_col: str = "ts",
                        start_col: str = "start", end_col: str = "end",
                        point_id: str = "event_id",
                        bucket_s: int = 300) -> DataFrame:
    """Per-key containment summary: total (point, interval) pairs and
    distinct covered points.  -> (key, n_pairs, n_points)."""
    m = interval_join(points, intervals, key, ts_col,
                      start_col, end_col, bucket_s)
    return m.groupBy(key).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.countDistinct(point_id).cast("long").alias("n_points"),
    )
