"""Counter-rate semantics (PromQL ``increase``/``rate``, RRDtool
COUNTER): per-series monotone counters that occasionally reset to
zero, rolled up into per-bucket increase and per-second rate.

Engine addition (no reference counterpart): transcript/metrics
pipelines carry cumulative counters (bytes sent, tokens emitted,
request totals) whose resets — process restarts — must not show up as
negative spikes.

Reset convention (Prometheus): if value < previous value, the counter
restarted from 0, so the increase attributable to that step is the new
value itself; the first sample of a series contributes nothing (no
earlier sample to difference against).

Scale shape: ONE exchange — the lag window partitions by the series
key, and the (key, bucket) aggregation reuses that partitioning
(hash(key) clusters any (key, ...) grouping; the same
subset-of-group-keys property the tier cascade exploits).  All
arithmetic is lag + CASE + sum: pure SQL, exactly oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_increase(df: DataFrame, key: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     tiebreak_col: str | None = None) -> DataFrame:
    """Per-sample reset-adjusted increase: lag-difference if the
    counter moved forward, the raw value after a reset, null for the
    first sample of a series.  Adds ``increase`` and ``is_reset``.
    Pass ``tiebreak_col`` (a unique id) when ``ts_col`` can collide
    within a key, to keep the lag order total."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(value_col).over(w)
    delta = F.col(value_col) - prev
    return df.select(
        "*",
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .when(delta < 0, F.col(value_col).cast("double"))
        .otherwise(delta.cast("double"))
        .alias("increase"),
        # coalesce: a series' first sample is NOT a reset (and a null
        # here would make an all-first-samples bucket sum to null
        # where 0 is meant)
        F.coalesce(delta < 0, F.lit(False)).alias("is_reset"),
    )


def counter_rate(df: DataFrame, key: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 bucket_s: int = 3600,
                 tiebreak_col: str | None = None) -> DataFrame:
    """Per (key, bucket) counter rollup: total reset-adjusted
    increase, per-second rate, sample and reset counts.  Bucket start
    is the floor of ``ts`` to ``bucket_s`` seconds.

    -> (key, bucket_start, n_samples, n_resets, increase_sum, rate)
    """
    inc = counter_increase(df, key, ts_col, value_col, tiebreak_col)
    bucket = F.timestamp_seconds(
        F.floor(
            F.unix_timestamp(F.col(ts_col).cast("timestamp")) / bucket_s
        ) * bucket_s
    ).cast(df.schema[ts_col].dataType)
    return (
        inc.groupBy(F.col(key), bucket.alias("bucket_start"))
        .agg(
            F.count("*").alias("n_samples"),
            F.sum(F.col("is_reset").cast("long")).alias("n_resets"),
            F.sum("increase").alias("increase_sum"),
        )
        .withColumn("rate", F.col("increase_sum") / bucket_s)
    )
