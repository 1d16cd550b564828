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
