"""Clean-room scaling measurement: cascade + feature jobs at several
parallelism levels.  Run ALONE (any concurrent load poisons it).

    nohup python tools/scaling_matrix.py > /tmp/scaling_matrix.json 2>/tmp/sm.err &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import cascade_job, feature_job  # noqa: E402

PATH = os.environ.get("SM_INPUT", "/tmp/ts_pymfe_spark_bench_turns_sf1.0")
REPS = int(os.environ.get("SM_REPS", "2"))
LEVELS = [int(x) for x in os.environ.get("SM_LEVELS", "2,8,32").split(",")]


def timed(job, cpus: int) -> float:
    from ts_pymfe_spark.session import get_spark

    spark = get_spark(f"sm_{job.__name__}_{cpus}", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.read.parquet(PATH).count()
    job(spark, PATH)  # warm-up: JIT + python worker pool
    dt = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        job(spark, PATH)
        dt = min(dt, time.perf_counter() - t0)
    spark.stop()
    return dt


def main() -> None:
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM '{PATH}/*.parquet'").fetchone()[0]
    out: dict = {"input_turns": n, "input": PATH, "reps": REPS}
    for job in (cascade_job, feature_job):
        name = job.__name__
        for c in LEVELS:
            dt = timed(job, c)
            out[f"{name}_local{c}_sec"] = round(dt, 2)
            print(json.dumps({f"{name}_local{c}_sec": round(dt, 2)}),
                  file=sys.stderr, flush=True)
        for a, b in zip(LEVELS, LEVELS[1:]):
            if b == 4 * a:
                out[f"{name}_eff_{a}to{b}"] = round(
                    out[f"{name}_local{a}_sec"] / (4 * out[f"{name}_local{b}_sec"]), 3
                )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
