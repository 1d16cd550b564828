"""Local-trend and level-shift detection over per-key ordered series.

Round-6 additions beyond the reference surface (the reference's trend
features — ft_linearity / ft_trend, _summary.py / autocorr.py — are
whole-series scalars; production monitoring wants the *localized*
counterparts): a CUSUM level-shift detector per series and a rolling
OLS slope.  Both are pure SQL — windows + moment algebra, no Python —
and plan as ONE exchange per the subset-of-group-keys rule (every
window and aggregation partitions by the series key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 5% critical value of sup|B(t)| for a Brownian bridge (the
#: Kolmogorov distribution), the classic CUSUM level-shift gate
#: (Page 1954 / Brown-Durbin-Evans 1975 form).
CUSUM_CRIT_5PCT = 1.358


def cusum_changepoint(df: DataFrame, key: str = "conv_id",
                      order_col: str = "turn_idx",
                      value_col: str = "value",
                      crit: float = CUSUM_CRIT_5PCT) -> DataFrame:
    """Per-series CUSUM level-shift screen: the standardized running
    sum of deviations from the series mean,

        c_t = sum_{i<=t} (v_i - mean) / (sd * sqrt(n)),

    whose max |c_t| exceeds ``crit`` under a level shift (sup of a
    Brownian bridge under H0).  -> one row per key:
    (key, n, cusum_stat, changepoint_at, detected).

    ``changepoint_at`` is the smallest ``order_col`` attaining the max
    |c_t| (the estimated shift location); series with n < 2 or zero
    spread emit NULL stat/location and detected = 0.

    Determinism: the mean and sd are rounded to 6 decimals BEFORE the
    running sum (both engines then accumulate identical addends in the
    same total order), each c_t rounds to 6 decimals before the max /
    argmax, and ties break to the smallest order value — bit-stable
    across engines and partitionings.

    Scale shape: ONE exchange — the moment window, the running-sum
    window, the max window and the final aggregation all partition by
    ``key``.  No joins, no Python.
    """
    v = F.col(value_col).cast("double")
    wk = Window.partitionBy(key)
    wrun = (Window.partitionBy(key).orderBy(F.col("_ord").asc())
            .rowsBetween(Window.unboundedPreceding, 0))

    n = F.count("*").over(wk).cast("double")
    s1 = F.sum(v).over(wk)
    s2 = F.sum(v * v).over(wk)
    var = F.when(n > 1, (s2 - s1 * s1 / n) / (n - 1))
    mu = F.round(s1 / n, 6)
    # The 6-dp round can flatten a tiny-but-positive sd (0 < sd <
    # ~5e-7) to exactly 0.0, and under ANSI (Spark 4 default) the c_t
    # division then kills the whole job with DIVIDE_BY_ZERO (round-6
    # ADVICE, reproduced with values i*1e-7).  Null it out instead so
    # degenerate-spread series take the documented NULL-stat path.
    sd0 = F.round(F.sqrt(F.when(var > 0, var)), 6)
    sd = F.when(sd0 > 0, sd0)

    staged = df.select(
        F.col(key), F.col(order_col).alias("_ord"),
        v.alias("_v"), n.alias("_n"), mu.alias("_mu"), sd.alias("_sd"))
    c = F.round(F.sum(F.col("_v") - F.col("_mu")).over(wrun)
                / (F.col("_sd") * F.sqrt(F.col("_n"))), 6)
    staged = staged.withColumn("_absc", F.abs(c))
    stat = F.max("_absc").over(wk)
    staged = staged.withColumn("_stat", stat)
    return staged.groupBy(key).agg(
        F.max("_n").cast("long").alias("n"),
        (F.max("_stat") + F.lit(0.0)).alias("cusum_stat"),
        F.min(F.when(F.col("_absc") == F.col("_stat"), F.col("_ord")))
        .alias("changepoint_at"),
        F.max(F.when(F.col("_stat") > float(crit), 1).otherwise(0))
        .cast("long").alias("detected"))


def rolling_slope(df: DataFrame, k: int = 20, key: str = "conv_id",
                  order_col: str = "turn_idx",
                  value_col: str = "value") -> DataFrame:
    """Rolling OLS slope over the trailing ``k`` points of each series
    — the localized complement to the whole-series ``ft_linearity``
    (reference _summary.py): regress value on its within-series rank
    over a ROWS frame, emit only full frames.

    -> (key, order_col, slope_k) with slope in value-units per step.

    The regressor is the per-key ``row_number`` (NOT the raw order
    column): shift-invariant, so the slope is per-step and the integer
    sums sum(x), sum(x^2) stay exactly representable; only sum(y) and
    sum(x*y) are float sums, at frame magnitudes where the 6-decimal
    round absorbs engine summation-order differences (same convention
    as the moving_* family).

    Scale shape: ONE exchange — row_number, both frame windows and the
    projection share the ``key`` partitioning.  O(k) per row, no
    self-join.
    """
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    wf = w.rowsBetween(-(k - 1), 0)
    v = F.col(value_col).cast("double")
    staged = df.select(
        F.col(key), F.col(order_col),
        F.row_number().over(w).cast("double").alias("_x"), v.alias("_v"))
    nn = F.count("*").over(wf).cast("double")
    sx = F.sum("_x").over(wf)
    sy = F.sum("_v").over(wf)
    sxx = F.sum(F.col("_x") * F.col("_x")).over(wf)
    sxy = F.sum(F.col("_x") * F.col("_v")).over(wf)
    slope = F.round((nn * sxy - sx * sy) / (nn * sxx - sx * sx), 6)
    return (staged
            .withColumn("_n", nn)
            .withColumn("_slope", slope)
            .where(F.col("_n") >= k)
            .select(key, order_col,
                    (F.col("_slope") + F.lit(0.0)).alias("slope_k")))


def key_ols(df: DataFrame, key: str = "user_id", x_col: str = "ts",
            y_col: str = "value") -> DataFrame:
    """Per-key OLS fit + Pearson correlation of two columns (late
    round 6): slope/intercept of y ~ x and corr(x, y) — "is this
    user's metric drifting with time / with another metric", the
    whole-key counterpart of ``rolling_slope``'s local view.
    Timestamps are accepted for ``x_col`` (cast to epoch seconds).

    -> (key, n, corr_xy, slope, intercept); keys with < 2 points or
    zero variance on either side emit NULLs (corr needs both, the
    fit needs var(x) > 0).

    Numerics: TWO-PASS centered sums — the 6-dp-rounded per-key means
    attach as unbounded windows (no self-join, the
    counters.mad_anomaly lesson) and the co-moments sum (x-mx)(y-my)
    at spread scale, so engine summation order dies in the 6-dp round
    (raw Σxy with epoch-scale x carries ~1e15 partials).  All ratios
    divide inside the ok-guard (ANSI lazy CaseWhen).

    Scale shape: ONE exchange — mean windows and the final
    aggregation all partition by ``key``; per-key state is five
    running sums.
    """
    x0 = F.col(x_col)
    x = (x0.cast("timestamp").cast("double")
         if dict(df.dtypes)[x_col] in ("timestamp", "timestamp_ntz", "date")
         else x0.cast("double"))
    y = F.col(y_col).cast("double")
    wk = Window.partitionBy(key)
    rows = (df.where(x.isNotNull() & y.isNotNull())
            .select(F.col(key), x.alias("_x"), y.alias("_y"))
            .withColumn("_mx", F.round(F.avg("_x").over(wk), 6))
            .withColumn("_my", F.round(F.avg("_y").over(wk), 6)))
    dx = F.col("_x") - F.col("_mx")
    dy = F.col("_y") - F.col("_my")
    agg = rows.groupBy(key).agg(
        F.count("*").alias("_n"),
        F.max("_mx").alias("_mx"), F.max("_my").alias("_my"),
        F.sum(dx * dy).alias("_sxy"),
        F.sum(dx * dx).alias("_sxx"),
        F.sum(dy * dy).alias("_syy"))
    ok_corr = (F.col("_n") > 1) & (F.col("_sxx") > 0) & (F.col("_syy") > 0)
    ok_fit = (F.col("_n") > 1) & (F.col("_sxx") > 0)
    corr = F.col("_sxy") / F.sqrt(F.col("_sxx") * F.col("_syy"))
    slope = F.col("_sxy") / F.col("_sxx")
    return agg.select(
        F.col(key),
        F.col("_n").alias("n"),
        (F.round(F.when(ok_corr, corr), 6) + F.lit(0.0)).alias("corr_xy"),
        (F.round(F.when(ok_fit, slope), 6) + F.lit(0.0)).alias("slope"),
        (F.round(F.when(ok_fit, F.col("_my") - slope * F.col("_mx")), 6)
         + F.lit(0.0)).alias("intercept"))
