"""Scale-stress the round-5 analytics ops: 10M synthetic events
(100x the sf0.01 contract table), local[8] — records wall seconds and
the shuffle-bounded row counts that make each op 100 TB-shaped."""
import time
from ts_pymfe_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("scale-stress", cpus=8, shuffle_partitions=8)
N = 10_000_000
ev = (spark.range(N)
      .select(
          F.col("id").alias("event_id"),
          (F.lit(1704067200) + (F.col("id") * 259) % 2592000)
          .cast("timestamp").alias("ts"),
          (F.pmod(F.xxhash64("id"), F.lit(100_000))).alias("user_id"),
          F.element_at(F.array(*[F.lit(x) for x in
              ("view", "click", "purchase", "signup", "error")]),
              (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int")
          ).alias("event_type"),
          (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10000)) / 100.0)
          .alias("value"),
      )).persist()
print("rows:", ev.count())

from ts_pymfe_spark.operators.sketches import hll_sketch, hll_estimate
from ts_pymfe_spark.operators.funnel import funnel
from ts_pymfe_spark.operators.counters import time_weighted_avg, burst_stats
from ts_pymfe_spark.operators.histogram import histogram_quantiles

def timed(name, df):
    # noop writer: count() lets Catalyst prune aggregate values and
    # eliminate whole window stages (round-6 finding) — the wall must
    # cover EVERY output column.  Row count reported from an untimed
    # second pass.
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"STRESS {name}: {wall:.2f}s out_rows={df.count()}")

day = ev.select(F.to_date("ts").alias("day"), "user_id", "ts", "event_type", "value", "event_id")
timed("hll_daily_10M", hll_estimate(hll_sketch(day, ["day"], "user_id"), ["day"]))
timed("funnel_10M", funnel(day, [F.col("event_type")==s for s in ("view","click","purchase")],
                           tiebreak_col="event_id"))
timed("twa_10M", time_weighted_avg(day, bucket_s=86400))
timed("burst_10M", burst_stats(day, window_s=3600))
timed("histq_10M", histogram_quantiles(day, ["user_id"], "value", [0.5, 0.95], 0.0, 100.0, 100))

# ---------------------------------------------------------------------------
# Round 6: connected-components scale stress (VERDICT r5 item #4) — the
# most shuffle-iterative operator.  10M-edge graph of 64-node chains
# (diameter 63) plus ONE 4096-node chain (diameter 4095): with min-label
# + path halving the round count must stay O(log d), never O(d).
# Correctness is self-evident on chains: comp(v) == v - v % chain_len.
# ---------------------------------------------------------------------------
from ts_pymfe_spark.operators.graph import connected_components

E = 10_000_000
chains = (spark.range(E + E // 64)  # extra ids so edge count lands >= E
          .where(F.pmod(F.col("id") + 1, F.lit(64)) != 0)
          .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
          .limit(E))
LONG_BASE = 2_000_000_000  # disjoint id space for the long chain
long_chain = (spark.range(4095)
              .select((F.col("id") + LONG_BASE).alias("src"),
                      (F.col("id") + LONG_BASE + 1).alias("dst")))
edges = chains.unionByName(long_chain).persist()
n_edges = edges.count()

stats = {}
t0 = time.perf_counter()
cc = connected_components(edges, stats=stats).persist()
n_nodes = cc.count()
wall = time.perf_counter() - t0
bad_short = (cc.where(F.col("node") < LONG_BASE)
             .where(F.col("comp") != F.col("node") - F.pmod(F.col("node"),
                                                            F.lit(64)))
             .count())
bad_long = (cc.where(F.col("node") >= LONG_BASE)
            .where(F.col("comp") != LONG_BASE).count())
print(f"STRESS cc_10M_edges: {wall:.2f}s nodes={n_nodes} edges={n_edges} "
      f"rounds={stats['rounds']} (diameter 4095 -> O(log d) bound ~16) "
      f"wrong_labels={bad_short + bad_long}")

# ---------------------------------------------------------------------------
# Round 6: the new ordered-window / robust-baseline analytics family at
# 10M events — trend (CUSUM + rolling slope, per-series windows),
# burstiness (two-pass centered gap variance), MAD anomaly (two exact
# full-sort percentiles per key), interval union (gaps-and-islands) and
# PAA/SAX.  All plan one exchange via the subset-of-group-keys rule;
# the walls here record that each stays shuffle-bounded at 100x the
# contract-scale inputs.
# ---------------------------------------------------------------------------
from ts_pymfe_spark.operators.trend import cusum_changepoint, rolling_slope
from ts_pymfe_spark.operators.counters import burstiness, mad_anomaly
from ts_pymfe_spark.operators.intervals import interval_union
from ts_pymfe_spark.operators.downsample import paa_sax

series = ev.select(F.col("user_id").cast("string").alias("conv_id"),
                   F.col("event_id").alias("turn_idx"), "ts", "value")
timed("cusum_10M", cusum_changepoint(series))
timed("rolling_slope_10M", rolling_slope(series, k=20))
timed("burstiness_10M", burstiness(ev))
timed("mad_anomaly_10M", mad_anomaly(ev))
e6 = F.col("ts").cast("timestamp").cast("double")
iv = ev.select("user_id", e6.alias("start"), (e6 + F.col("value")).alias("end"))
timed("interval_union_10M", interval_union(iv))
timed("paa_sax_10M", paa_sax(series, n_segments=8, alphabet=4))

# ---------------------------------------------------------------------------
# Late round 6: drift screens + count-min sketch + tf-idf at scale.
# ks/psi are per-event_type windows (5 fat keys here — the worst
# ordered-window shape: ~2M rows per key through one sort); cms is
# O(d*w) shuffle by construction.
# ---------------------------------------------------------------------------
from ts_pymfe_spark.operators.drift import daily_drift, ks_drift, psi_drift
from ts_pymfe_spark.operators.sketches import cms_topk

grp = F.col("user_id") % 2
timed("ks_drift_10M", ks_drift(ev, grp))
timed("psi_drift_10M", psi_drift(ev, grp))
timed("daily_drift_10M", daily_drift(ev))
timed("cms_topk_10M", cms_topk(ev, "user_id", k=50))

# one 10M-row HOT KEY through the KS screen: plain single-window vs
# the bucketed two-level prefix sum (value-equal, asserted in pytest)
hot = (spark.range(10_000_000).select(
    F.lit("hot").alias("event_type"),
    (F.pmod(F.xxhash64("id"), F.lit(100000)) / 7.0).alias("value"),
    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2)).alias("user_id")))
timed("ks_hotkey_plain_10M", ks_drift(hot, grp))
timed("ks_hotkey_bucketed64_10M", ks_drift(hot, grp, buckets=64))
from ts_pymfe_spark.operators.drift import ks_drift_binned
timed("ks_hotkey_binned256_10M", ks_drift_binned(hot, grp, bins=256))
