"""Production analytics job: events -> daily sketch store + behavioral
report tables, the analytics-half companion of jobs/ingest_rollup.py.

Run form (north rule — package surface via spark-submit --py-files):

    cd /root/repo && zip -qr /tmp/engine.zip ts_pymfe_spark
    spark-submit --py-files /tmp/engine.zip jobs/analytics_report.py \
        --input /path/to/events_parquet --output /path/to/report \
        [--cpus 8] [--funnel view,click,purchase] [--window-s 86400]

Writes under ``--output``:

* ``hll_daily/``    daily HLL register tables (the MERGEABLE artifact
                    — re-runs for new days append; any date-range
                    distinct/overlap query max-merges these without
                    re-scanning events)
* ``distinct_daily/ weekly_active/ overlap_daily/`` estimates derived
                    from the sketch store alone
* ``funnel/ cohort_retention/ transitions/ profile/`` behavioral
                    report tables

Every derived table reads the SKETCH store, not raw events, except the
single raw pass shared by funnel/cohort/transitions/profile — the
job's scan count is 2 regardless of how many report tables it emits.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="events parquet path")
    ap.add_argument("--output", required=True, help="report root")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--funnel", default="view,click,purchase",
                    help="comma-separated event_type funnel steps")
    ap.add_argument("--window-s", type=float, default=86400.0)
    ap.add_argument("--hll-p", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ts_pymfe_spark.operators.funnel import (cohort_retention, funnel,
                                                 transition_matrix)
    from ts_pymfe_spark.operators.profile import profile_table
    from ts_pymfe_spark.operators.sketches import (hll_estimate,
                                                   hll_overlap,
                                                   hll_rolling, hll_sketch)
    from ts_pymfe_spark.session import get_spark

    spark = get_spark("analytics-report", cpus=args.cpus)
    out = args.output.rstrip("/")
    ev = spark.read.parquet(args.input)

    # --- pass 1: the mergeable daily sketch store -------------------
    daily = ev.select(F.to_date("ts").alias("day"), "user_id")
    sk = hll_sketch(daily, ["day"], "user_id", p=args.hll_p)
    sk.write.mode("overwrite").parquet(f"{out}/hll_daily")
    sk = spark.read.parquet(f"{out}/hll_daily")  # derive from storage

    hll_estimate(sk, ["day"], args.hll_p) \
        .write.mode("overwrite").parquet(f"{out}/distinct_daily")
    hll_rolling(sk, "day", 7, args.hll_p) \
        .write.mode("overwrite").parquet(f"{out}/weekly_active")
    hll_overlap(sk, "day", args.hll_p) \
        .write.mode("overwrite").parquet(f"{out}/overlap_daily")

    # --- pass 2: behavioral tables over one raw scan ----------------
    steps = [F.col("event_type") == s
             for s in args.funnel.split(",") if s]
    funnel(ev, steps, key="user_id", ts_col="ts",
           window_s=args.window_s, tiebreak_col="event_id") \
        .write.mode("overwrite").parquet(f"{out}/funnel")
    cohort_retention(ev) \
        .write.mode("overwrite").parquet(f"{out}/cohort_retention")
    transition_matrix(ev, tiebreak_col="event_id") \
        .write.mode("overwrite").parquet(f"{out}/transitions")
    profile_table(ev, ["user_id", "event_type", "value"],
                  p=args.hll_p) \
        .write.mode("overwrite").parquet(f"{out}/profile")

    # row counts from parquet footers — never a read-after-write job
    # (the ingest job's round-5 metric contract, plans/manifest.py)
    from ts_pymfe_spark.plans.manifest import _footer_stats

    for t in ("hll_daily", "distinct_daily", "weekly_active",
              "overlap_daily", "funnel", "cohort_retention",
              "transitions", "profile"):
        rows, nbytes = _footer_stats(f"{out}/{t}")
        print(f"REPORT {t}: {rows} rows, {nbytes} bytes")
    print("ANALYTICS_REPORT_DONE")


if __name__ == "__main__":
    main()
