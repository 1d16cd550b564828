"""Continuous-aggregate tier cascade: raw -> 1m -> 1h -> 1d.

The reference has no tiers (one in-RAM array); tiers are the north
rule's recast of its precompute cache (``_internal.py:1158-1331``) into
materialized continuous aggregates.  Each tier stores one mergeable
moment vector per ``(conv_id, series, bucket_start)`` —
functions/moments.py — so the cascade NEVER re-reads raw data:

    raw turns --(groupBy 1m bucket, moment_aggs)--> tier 1m
    tier 1m  --(groupBy hour,  moment_merge_aggs)--> tier 1h
    tier 1h  --(groupBy day,   moment_merge_aggs)--> tier 1d

Scale design:
  - The 1m aggregation is the only pass over raw points; everything
    above it shuffles O(#buckets) rows.  At 10^12 turns / ~10^9
    conv-minutes that is a 1000x shuffle reduction per level.
  - Skew: hot conversations (Zipf head, FIXTURES.md) concentrate rows
    in few (conv_id, bucket) keys.  Hash aggregation already computes
    map-side partials, and ``salted=True`` additionally pre-aggregates
    on (conv_id, series, bucket, salt) before the final merge —
    identical results (moment merge is associative+commutative), but no
    single reducer ever owns a whole hot key.  AQE skew handling stays
    on as the runtime backstop (session.py).
  - ``turn_rate`` is rollup-emergent: the count-per-finer-bucket becomes
    the *value* series one tier up (turns/minute rolled into 1h/1d
    moment vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_pymfe_spark.functions.moments import moment_aggs, moment_merge_aggs

#: tier -> date_trunc unit
TIERS = {"1m": "minute", "1h": "hour", "1d": "day"}
#: cascade order
TIER_ORDER = ["1m", "1h", "1d"]

KEY = ["conv_id", "series", "bucket_start"]


def bucket(ts_col: str, tier: str) -> F.Column:
    return F.date_trunc(TIERS[tier], F.col(ts_col)).alias("bucket_start")


def rollup_raw(series_df: DataFrame, tier: str = "1m", salted: bool = False,
               salt_buckets: int = 16) -> DataFrame:
    """Derived-series rows -> moment vectors per (conv_id, series, bucket).

    ``salted``: two-phase exact aggregation for hot (conv, bucket) keys.
    """
    with_bucket = series_df.select(
        "conv_id", "series", "ts", "value", bucket("ts", tier)
    )
    if not salted:
        return with_bucket.groupBy(*KEY).agg(*moment_aggs("value", "ts"))
    partial = (
        with_bucket
        .withColumn("_salt", F.pmod(F.hash("ts"), F.lit(salt_buckets)))
        .groupBy(*KEY, "_salt")
        .agg(*moment_aggs("value", "ts"))
    )
    return partial.groupBy(*KEY).agg(*moment_merge_aggs())


def cascade(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """Merge a finer tier's moment vectors into a coarser tier.

    Pure moment-merge: associative, exact, O(child buckets)."""
    return (
        tier_df
        .withColumn("bucket_start", F.date_trunc(TIERS[to_tier], "bucket_start"))
        .groupBy(*KEY)
        .agg(*moment_merge_aggs())
    )


def turn_rate_series(tier_df: DataFrame, base_series: str = "text_len") -> DataFrame:
    """Emergent turn-rate series: the finer tier's per-bucket count ``n``
    becomes a value series (conv_id, 'turn_rate', ts=bucket_start, value=n).

    Feed the result back through ``rollup_raw`` at a coarser tier to get
    turn-rate moment vectors (e.g. 1m counts rolled into 1h stats)."""
    return (
        tier_df
        .filter(F.col("series") == base_series)
        .select(
            "conv_id",
            F.lit("turn_rate").alias("series"),
            F.col("bucket_start").alias("ts"),
            F.col("n").cast("double").alias("value"),
        )
    )


def build_all_tiers(series_df: DataFrame, salted: bool = True,
                    include_turn_rate: bool = True,
                    persist: bool = False) -> dict[str, DataFrame]:
    """The full cascade.  Returns {tier: moments DataFrame}.

    ``persist=True`` caches the 1m tier (it is consumed twice: by the
    emergent turn-rate rollup and by the 1h cascade) and the 1h tier
    (consumed by 1d) — the reference's precompute-cache idea
    (``_internal.py:1158-1331``) applied to tiers.  Callers that write
    each tier to storage (plans/manifest.py) should leave this False
    and rely on the written table instead."""
    from pyspark import StorageLevel

    tiers: dict[str, DataFrame] = {}
    t1m = rollup_raw(series_df, "1m", salted=salted)
    if include_turn_rate:
        if persist:
            t1m = t1m.persist(StorageLevel.MEMORY_AND_DISK)
        rate = rollup_raw(turn_rate_series(t1m), "1m", salted=False)
        t1m = t1m.unionByName(rate)
    tiers["1m"] = t1m
    if persist:
        tiers["1m"] = tiers["1m"].persist(StorageLevel.MEMORY_AND_DISK)
    tiers["1h"] = cascade(tiers["1m"], "1h")
    if persist:
        tiers["1h"] = tiers["1h"].persist(StorageLevel.MEMORY_AND_DISK)
    tiers["1d"] = cascade(tiers["1h"], "1d")
    return tiers
