"""Per-tier golden fixtures: meta-features extracted from tier-rollup
series must bit-match the driver-side kernels applied to the same
bucket values (BASELINE.json: "golden fixtures per tier")."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from ts_pymfe_spark.api import TSMFESpark
from ts_pymfe_spark.functions import kernels as K
from ts_pymfe_spark.functions.summaries import summarize_array
from ts_pymfe_spark.operators.derive import derive_series
from ts_pymfe_spark.operators.rollup import rollup_raw, turn_rate_series

FEATS = ["acf", "period", "hist_entropy", "dw", "trend_strength", "ps_entropy"]


def test_tier_series_features_match_driver_kernels(spark, turns, turns_pdf):
    # engine path: 1m tier -> turn_rate series -> feature extraction
    t1m = rollup_raw(derive_series(turns), "1m")
    rate = turn_rate_series(t1m).withColumn("turn_idx", F.col("ts").cast("long"))
    eng = TSMFESpark(features=FEATS, summaries=("mean", "sd"))
    got = eng.extract(rate.select("conv_id", "series", "turn_idx", "value")).toPandas()

    # oracle path: same 1m bucket counts computed in pandas
    pdf = turns_pdf.copy()
    pdf["bucket"] = pdf["ts"].dt.floor("min")
    counts = (
        pdf.groupby(["conv_id", "bucket"]).size().rename("value").reset_index()
    )
    convs = sorted(counts.conv_id.unique())[:8]
    for conv in convs:
        x = (
            counts[counts.conv_id == conv]
            .sort_values("bucket")["value"]
            .to_numpy(dtype=float)[-512:]
        )
        rows = got[(got.conv_id == conv)].set_index("name")["value"]
        if x.size < 8:
            continue
        assert rows["period"] == float(K.ts_period(x))
        assert rows["dw"] == K.durbin_watson(x) / 4.0
        exp = dict(
            summarize_array(K.acf(x, nlags=min(16, x.size - 2)), ("mean", "sd"))
        )
        assert rows["acf.mean"] == exp["mean"]
        np.testing.assert_array_equal(
            rows["hist_entropy"], K.hist_entropy(x)
        )
