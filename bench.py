"""Headline benchmark (driver contract, BASELINE.md).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

The headline metric is the full-cascade wall time; ``queries`` also
carries rolled-up points/sec (the BASELINE.json metric) and the N->4N
scaling-efficiency evidence (same cascade job at local[8] vs local[32]
on the same synthetic transcript input — the sandbox proxy for two
cluster sizes; see BENCH/BASELINE.md).

Set SPARK_GRAFT_SKIP_SCALING=1 to skip the dual-parallelism section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# sized so the 2-core cascade runs ~1 min: constant overheads (session
# setup, stage scheduling) stay <5% and the N->4N efficiency measures
# compute scaling, not scheduler latency (see BENCH/BASELINE.md for the
# host-contention analysis behind the 2->8 choice)
SCALING_SF = float(os.environ.get("SPARK_GRAFT_SCALING_SF", "1.0"))
SYNTH_CACHE = f"/tmp/ts_pymfe_spark_bench_turns_sf{SCALING_SF}"


def _sf_from_dir(d: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def run_headline(spark) -> dict[str, float]:
    """Representative operator suite on the driver's testdata."""
    import __spark_entry__ as E

    names = [
        "rollup_1m", "rollup_1h_cascade", "tier_stats_1d", "moving_avg",
        "moving_sd_shift", "tile_stats", "acf_lags", "trev", "tc3",
        "hist_entropy", "ami_lag1", "gapfill_1m", "t_mean", "fs_len_stats",
        "exact_dedup", "token_stats", "doc_fingerprint", "minhash_lsh_candidates",
        "ann_topk", "ann_lsh",
    ]
    qs = E.queries()
    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    return times


def cascade_job(spark, turns_path: str) -> None:
    """The flagship ingest job: read transcripts -> derive -> full tier
    cascade (persisted 1m/1h so each level computes once, like the
    production write path).  Every tier forced to completion."""
    from pyspark.sql import functions as F

    from ts_pymfe_spark.operators.derive import derive_series
    from ts_pymfe_spark.operators.rollup import build_all_tiers

    turns = spark.read.parquet(turns_path)
    series = derive_series(turns)
    tiers = build_all_tiers(series, salted=True, persist=True)
    for t, df in tiers.items():
        df.agg(F.sum("s1"), F.count("*")).collect()
    for df in tiers.values():
        df.unpersist()


def feature_job(spark, turns_path: str, min_turns: int = 32) -> int:
    """Per-series Arrow-kernel feature extraction over the active
    (Zipf-head) conversations — the engine's compute-bound path:
    embarrassingly parallel over conversations, no shuffle barriers
    beyond the initial groupBy, Python workers saturate all cores."""
    from pyspark.sql import functions as F

    from ts_pymfe_spark.operators.arrow_kernels import series_features
    from ts_pymfe_spark.operators.derive import series_of

    turns = spark.read.parquet(turns_path)
    s = series_of(turns, "text_len")
    # active-conversation selection via aggregate + broadcast semi-join:
    # one cheap map-side-combined aggregate instead of a full-window pass
    active_ids = (
        s.groupBy("conv_id").count().filter(F.col("count") >= min_turns)
        .select("conv_id")
    )
    active = s.join(F.broadcast(active_ids), "conv_id")
    feats = series_features(
        active,
        features=[
            "acf", "pacf", "period", "ps_entropy", "hist_entropy", "dw",
            "trend_strength", "season_strength", "lz_complexity",
            "sample_entropy", "approx_entropy", "model_linear", "model_sine",
            "model_naive_seasonal",
        ],
        # 512-point tail cap = the reference's own test truncation
        # (test_a.py:27); also equalizes per-group cost so the Zipf-head
        # conversations cannot gate the stage critical path
        max_points=512,
    )
    return feats.count()


def timed_features(cpus: int, turns_path: str) -> tuple[float, int]:
    from ts_pymfe_spark.session import get_spark

    spark = get_spark(f"bench_f{cpus}", cpus=cpus, shuffle_partitions=cpus)
    feature_job(spark, turns_path)  # warm-up (JIT + Python worker pool)
    dt = float("inf")
    rows = 0
    for _ in range(2):
        t0 = time.perf_counter()
        rows = feature_job(spark, turns_path)
        dt = min(dt, time.perf_counter() - t0)
    spark.stop()
    return dt, rows


def ensure_synth_input() -> str:
    if not os.path.exists(SYNTH_CACHE):
        from ts_pymfe_spark.session import get_spark
        from ts_pymfe_spark.synth import gen_turns

        spark = get_spark("bench_gen", cpus=CPUS)
        gen_turns(spark, SCALING_SF, text_mode="light").write.mode(
            "overwrite"
        ).parquet(SYNTH_CACHE)
        spark.stop()
    return SYNTH_CACHE


def timed_cascade(cpus: int, turns_path: str, reps: int = 3) -> tuple[float, int]:
    from ts_pymfe_spark.session import get_spark

    spark = get_spark(f"bench_c{cpus}", cpus=cpus, shuffle_partitions=cpus)
    # Warm-up run (untimed): JIT-compiles the whole-stage-codegen paths.
    # Without it the C2 compiler competes with all N task threads inside
    # the timed window, which *anti-scales* (32 cores measured 3x slower
    # than 8 purely from cold-JIT contention).  Steady-state (min of
    # reps) is what a long-running ingest job sees; min-of-N also damps
    # the +-10% host-CPU variance this shared VM exhibits.
    n = spark.read.parquet(turns_path).count()
    cascade_job(spark, turns_path)
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        cascade_job(spark, turns_path)
        dt = min(dt, time.perf_counter() - t0)
    spark.stop()
    return dt, n


def main() -> None:
    from ts_pymfe_spark.session import get_spark

    queries: dict[str, float] = {}

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    t_all = time.perf_counter()
    queries.update(run_headline(spark))
    headline_sec = round(time.perf_counter() - t_all, 3)
    spark.stop()

    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        path = ensure_synth_input()
        # N -> 4N scaling evidence: the tier-cascade ingest job at
        # local[2] vs local[8] (primary; both below this VM's host-
        # contention knee — see BENCH/BASELINE.md), local[32] reported
        # as the saturated upper point.
        t2, n = timed_cascade(2, path, reps=3)
        t8, _ = timed_cascade(8, path, reps=3)
        t32, _ = timed_cascade(32, path, reps=2)
        queries["cascade_input_turns"] = n
        for c, t in ((2, t2), (8, t8), (32, t32)):
            queries[f"cascade_local{c}_sec"] = round(t, 3)
            queries[f"cascade_points_per_sec_local{c}"] = round(n / t, 1)
        queries["scaling_efficiency_2_to_8"] = round(t2 / (4.0 * t8), 3)
        queries["scaling_efficiency_8_to_32"] = round(t8 / (4.0 * t32), 3)

    print(
        json.dumps(
            {
                "metric": "headline suite wall time (rollup cascade + "
                "feature + pipeline ops); see queries for per-op sec, "
                "rolled-up points/sec and 8->32-core scaling efficiency",
                "value": headline_sec,
                "unit": "sec",
                "queries": queries,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
