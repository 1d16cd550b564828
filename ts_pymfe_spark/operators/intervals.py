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


def interval_union(intervals: DataFrame, key: str = "user_id",
                   start: str = "start", end: str = "end") -> DataFrame:
    """Per-key union length of (possibly overlapping) closed intervals
    — the classic gaps-and-islands merge, one window pass (round 6).
    "Total seconds a conversation had a tool invocation in flight" is
    this op with tool spans as intervals.

    An interval opens a new island iff its start exceeds the running
    max end of everything sorted before it; islands then aggregate to
    their span, keys to their island count and covered total.

    -> (key, n_intervals, n_islands, covered_s)

    Scale shape: ONE exchange — the running-max window partitions by
    key, and both the (key, island) and (key) aggregations reuse that
    partitioning (subset-of-group-keys rule).  No self-join, no
    interval-vs-interval comparison: O(n log n) per key.

    ``start``/``end`` may be timestamps or already-numeric epoch
    seconds; numeric columns are used as-is (a timestamp round trip
    would quantize to microseconds and perturb the covered sum).
    """
    from pyspark.sql import Window
    from pyspark.sql.types import NumericType

    def _epochify(c: str):
        if isinstance(intervals.schema[c].dataType, NumericType):
            return F.col(c).cast("double")
        return F.col(c).cast("timestamp").cast("double")

    s = _epochify(start)
    e = _epochify(end)
    w = (Window.partitionBy(key).orderBy(s.asc(), e.asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_max = F.max(e).over(w)
    staged = intervals.select(
        F.col(key), s.alias("_s"), e.alias("_e"),
        F.when(prev_max.isNull() | (s > prev_max), 1)
        .otherwise(0).alias("_new"))
    wrun = (Window.partitionBy(key)
            .orderBy(F.col("_s").asc(), F.col("_e").asc())
            .rowsBetween(Window.unboundedPreceding, 0))
    staged = staged.withColumn("_island", F.sum("_new").over(wrun))
    islands = staged.groupBy(key, "_island").agg(
        F.count("*").cast("long").alias("_n"),
        F.min("_s").alias("_lo"), F.max("_e").alias("_hi"))
    return islands.groupBy(key).agg(
        F.sum("_n").cast("long").alias("n_intervals"),
        F.count("*").cast("long").alias("n_islands"),
        (F.round(F.sum(F.col("_hi") - F.col("_lo")), 6)
         + F.lit(0.0)).alias("covered_s"))
