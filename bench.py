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
SCALING_SF = float(os.environ.get("SPARK_GRAFT_SCALING_SF", "0.02"))
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


def cascade_job(spark, turns_path: str) -> int:
    """The flagship job: read transcripts -> derive -> full tier cascade
    -> force materialization.  Returns number of raw turns ingested."""
    from pyspark.sql import functions as F

    from ts_pymfe_spark.operators.derive import derive_series
    from ts_pymfe_spark.operators.rollup import build_all_tiers

    turns = spark.read.parquet(turns_path)
    n_turns = turns.count()
    tiers = build_all_tiers(derive_series(turns), salted=True)
    # force every tier fully (sum over a column defeats lazy short-circuit)
    for t, df in tiers.items():
        df.agg(F.sum("s1"), F.count("*")).collect()
    return n_turns


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


def timed_cascade(cpus: int, turns_path: str) -> tuple[float, int]:
    from ts_pymfe_spark.session import get_spark

    spark = get_spark(f"bench_c{cpus}", cpus=cpus, shuffle_partitions=cpus)
    # warm the JVM/scan once so we measure compute, not first-touch I/O
    spark.read.parquet(turns_path).count()
    t0 = time.perf_counter()
    n = cascade_job(spark, turns_path)
    dt = time.perf_counter() - t0
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
        t8, n = timed_cascade(8, path)
        t32, _ = timed_cascade(32, path)
        pps8, pps32 = n / t8, n / t32
        eff = pps32 / (4.0 * pps8)
        queries["cascade_local8_sec"] = round(t8, 3)
        queries["cascade_local32_sec"] = round(t32, 3)
        queries["cascade_points_per_sec_local8"] = round(pps8, 1)
        queries["cascade_points_per_sec_local32"] = round(pps32, 1)
        queries["scaling_efficiency_8_to_32"] = round(eff, 3)
        queries["cascade_input_turns"] = n

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
