"""Tier-cascade correctness: Spark moment rollups vs numpy oracles.

Mirrors the reference's precomp-on/off consistency oracle
(``/root/reference/test_b.py:31,43``) as the tier-consistency property:
a coarse tier computed by moment-merge from a finer tier must equal the
same tier computed directly from raw rows (SURVEY.md §5.2 item 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ts_pymfe_spark.operators.derive import derive_series
from ts_pymfe_spark.operators.rollup import (
    KEY,
    build_all_tiers,
    cascade,
    rollup_raw,
)
from ts_pymfe_spark.functions.moments import stat_columns


def _skew_e1071_m3(x: np.ndarray) -> float:
    # reference formula: /root/reference/tspymfe/_summary.py:149-209
    n = x.size
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    if n < 2 or m2 <= 0:
        return np.nan
    return m3 / m2**1.5 * ((n - 1) / n) ** 1.5


def _kurt_e1071_m3(x: np.ndarray) -> float:
    # reference formula: /root/reference/tspymfe/_summary.py:212-273
    n = x.size
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m4 = ((x - mu) ** 4).mean()
    if n < 2 or m2 <= 0:
        return np.nan
    return m4 / m2**2 * (1 - 1 / n) ** 2 - 3


def test_synth_deterministic_under_distribution(spark, turns, turns_pdf):
    got = turns.orderBy("conv_id", "turn_idx").toPandas()
    exp = turns_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    # per-turn text equality invariant (BASELINE.json input_hint)
    assert got["text"].tolist() == exp["text"].tolist()
    assert (got["ts"].values == exp["ts"].values).all()


def test_rollup_1m_matches_pandas_oracle(spark, turns, turns_pdf):
    got = (
        rollup_raw(derive_series(turns), "1m")
        .select(*KEY, *stat_columns())
        .orderBy(*KEY)
        .toPandas()
    )

    pdf = turns_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype(float)
    pdf["bucket_start"] = pdf["ts"].dt.floor("min")
    oracle = (
        pdf.groupby(["conv_id", "bucket_start"])["text_len"]
        .agg(["count", "mean", "var", "min", "max", "sum"])
        .reset_index()
    )
    sub = got[got["series"] == "text_len"].reset_index(drop=True)
    assert len(sub) == len(oracle)
    m = sub.merge(oracle, on=["conv_id", "bucket_start"], suffixes=("", "_o"))
    assert len(m) == len(sub)
    np.testing.assert_allclose(m["mean"], m["mean_o"], rtol=1e-12)
    np.testing.assert_allclose(
        m["var"].astype(float), m["var_o"].astype(float), rtol=1e-9, equal_nan=True
    )
    np.testing.assert_array_equal(m["count"], m["count_o"])
    np.testing.assert_allclose(m["sum"], m["sum_o"], rtol=1e-12)


def test_skew_kurt_formula_vs_numpy(spark, turns, turns_pdf):
    got = (
        rollup_raw(derive_series(turns), "1d")
        .select(*KEY, *stat_columns())
        .orderBy(*KEY)
        .toPandas()
    )
    pdf = turns_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype(float)
    pdf["bucket_start"] = pdf["ts"].dt.floor("D")
    for (conv, b), grp in list(pdf.groupby(["conv_id", "bucket_start"]))[:50]:
        x = grp["text_len"].to_numpy()
        row = got[
            (got.conv_id == conv)
            & (got.bucket_start == b)
            & (got.series == "text_len")
        ].iloc[0]
        exp_s, exp_k = _skew_e1071_m3(x), _kurt_e1071_m3(x)
        if np.isnan(exp_s):
            assert pd.isna(row["skewness"])
        else:
            np.testing.assert_allclose(row["skewness"], exp_s, rtol=1e-7)
        if np.isnan(exp_k):
            assert pd.isna(row["kurtosis"])
        else:
            np.testing.assert_allclose(row["kurtosis"], exp_k, rtol=1e-6)


def test_tier_consistency_merge_equals_direct(spark, turns):
    """1h from 1m moment-merge == 1h direct from raw (exact counts/min/max,
    float-tolerant sums)."""
    series = derive_series(turns).cache()
    t1m = rollup_raw(series, "1m")
    merged = cascade(t1m, "1h").orderBy(*KEY).toPandas()
    direct = rollup_raw(series, "1h").orderBy(*KEY).toPandas()
    assert len(merged) == len(direct)
    np.testing.assert_array_equal(merged["n"], direct["n"])
    np.testing.assert_array_equal(merged["mn"], direct["mn"])
    np.testing.assert_array_equal(merged["mx"], direct["mx"])
    np.testing.assert_array_equal(merged["first_v"], direct["first_v"])
    np.testing.assert_array_equal(merged["last_v"], direct["last_v"])
    for c in ["s1", "s2", "s3", "s4"]:
        np.testing.assert_allclose(merged[c], direct[c], rtol=1e-12)


def test_salted_rollup_equals_unsalted(spark, turns):
    series = derive_series(turns)
    a = rollup_raw(series, "1m", salted=False).orderBy(*KEY).toPandas()
    b = rollup_raw(series, "1m", salted=True).orderBy(*KEY).toPandas()
    np.testing.assert_array_equal(a["n"], b["n"])
    np.testing.assert_allclose(a["s1"], b["s1"], rtol=1e-12)
    np.testing.assert_allclose(a["s4"], b["s4"], rtol=1e-12)
    np.testing.assert_array_equal(a["first_v"], b["first_v"])


def test_build_all_tiers_shapes(spark, turns):
    tiers = build_all_tiers(derive_series(turns))
    counts = {t: df.count() for t, df in tiers.items()}
    assert counts["1m"] > counts["1h"] > 0
    assert counts["1h"] >= counts["1d"] > 0
    # turn_rate present at every tier
    assert tiers["1d"].filter("series = 'turn_rate'").count() > 0


def test_cascade_job_leaves_no_cached_relations(spark, turns, tmp_path):
    """Round-4 leak regression guard: build_all_tiers(persist=True)
    followed by unpersist_all() must leave the session CacheManager
    EMPTY.  A leaked entry silently substitutes into every later
    canonically-equal plan (Catalyst cache substitution) — it held
    storage memory indefinitely and made rounds 2-3's benchmark reps
    read cache instead of scanning raw."""
    from functools import reduce

    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "leak_turns")
    turns.write.mode("overwrite").parquet(in_dir)
    series = derive_series(spark.read.parquet(in_dir))
    tiers = build_all_tiers(series, salted=False, persist=True)
    checks = [
        df.agg(F.sum("s1").alias("s1"), F.count("*").alias("n"))
        .select(F.lit(t).alias("tier"), "s1", "n")
        for t, df in tiers.items()
    ]
    reduce(lambda a, b: a.unionByName(b), checks).collect()
    tiers.unpersist_all()
    # the actual failure mode: a leaked cache entry SUBSTITUTES into a
    # later canonically-equal plan.  Rebuild the same cascade and
    # assert no InMemoryRelation appears anywhere in its plans.
    # (A global cacheManager.isEmpty() check is unusable here: the
    # shared test session carries unrelated cached relations.)
    rebuilt = build_all_tiers(
        derive_series(spark.read.parquet(in_dir)), salted=False
    )
    for tier, df in rebuilt.items():
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryRelation" not in p and "InMemoryTableScan" not in p, (
            f"tier {tier} plan reads a leaked cache — the round-4 leak "
            f"is back:\n{p}"
        )
