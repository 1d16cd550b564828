"""Hot-key probe: one user holds 2M of 4M rows — the adversarial case
for the one-exchange (partition-by-key) analytics plans."""
import time
from ts_pymfe_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("skew-probe", cpus=8, shuffle_partitions=8)
N = 4_000_000
ev = (spark.range(N).select(
    F.col("id").alias("event_id"),
    (F.lit(1704067200) + F.col("id") % 2_000_000).cast("timestamp").alias("ts"),
    F.when(F.col("id") % 2 == 0, 0).otherwise(
        F.pmod(F.xxhash64("id"), F.lit(50_000)) + 1).alias("user_id"),
    F.element_at(F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                 (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3)) + 1).cast("int")
                 ).alias("event_type"),
    (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10000)) / 100.0).alias("value"),
)).persist()
print("rows:", ev.count(), "hot-key rows:", ev.filter("user_id = 0").count())

from ts_pymfe_spark.operators.counters import time_weighted_avg, burst_stats
from ts_pymfe_spark.operators.funnel import funnel

for name, df in [
    ("twa_hotkey", time_weighted_avg(ev, bucket_s=86400)),
    ("burst_hotkey", burst_stats(ev, window_s=3600)),
    ("funnel_hotkey", funnel(ev, [F.col("event_type")==s for s in ("view","click","purchase")],
                             tiebreak_col="event_id")),
]:
    t0 = time.perf_counter()
    n = df.count()
    print(f"SKEW {name}: {time.perf_counter()-t0:.2f}s out_rows={n}")

# ---------------------------------------------------------------------------
# Round 6: ONE key at far beyond the probe above (100M rows on a single
# user; 50x the 2M hot key) —
# the honest limit named in BENCH/BASELINE.md.  The per-key window plan
# funnels all 100M rows through one task; chunk_s splits the same key
# across time-range tasks and merges boundary state from a per-chunk
# table.  Both plans are value-equal (tests/test_round6_features.py);
# this probe records the wall-clock and task-split evidence.
# ---------------------------------------------------------------------------
from ts_pymfe_spark.operators.counters import counter_rate

HOT_N = 100_000_000
hot = (spark.range(HOT_N).select(
    F.col("id").alias("event_id"),
    (F.lit(1704067200) + F.col("id") % 10_000_000).cast("timestamp").alias("ts"),
    F.lit(0).alias("user_id"),
    (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10000)) / 100.0).alias("value"),
)).persist()
hot.count()

# task-split evidence: distinct shuffle partitions the hot key lands in
CHUNK = 100_000  # seconds -> ts span 10M s / 1e5 = 100 chunks
chunked_parts = (hot.select("user_id",
                            F.floor(F.col("ts").cast("double") / CHUNK)
                            .alias("_chunk"))
                 .repartition(8, "user_id", "_chunk")
                 .select(F.spark_partition_id().alias("p"))
                 .distinct().count())
mono_parts = (hot.repartition(8, "user_id")
              .select(F.spark_partition_id().alias("p"))
              .distinct().count())
print(f"SKEWHOT task-split: mono={mono_parts} chunked={chunked_parts} "
      f"(chunk_s={CHUNK}, {HOT_N:,} rows on one key)")

for name, df in [
    ("twa_hot1key_mono", time_weighted_avg(hot, bucket_s=86400)),
    ("twa_hot1key_chunked", time_weighted_avg(hot, bucket_s=86400,
                                          chunk_s=CHUNK)),
    ("burst_hot1key_mono", burst_stats(hot, window_s=3600)),
    ("burst_hot1key_chunked", burst_stats(hot, window_s=3600, chunk_s=CHUNK)),
    ("rate_hot1key_mono", counter_rate(hot, bucket_s=86400,
                                   tiebreak_col="event_id")),
    ("rate_hot1key_chunked", counter_rate(hot, bucket_s=86400,
                                      tiebreak_col="event_id",
                                      chunk_s=CHUNK)),
]:
    t0 = time.perf_counter()
    n = df.count()
    print(f"SKEWHOT {name}: {time.perf_counter()-t0:.2f}s out_rows={n}")
