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
    sd = F.round(F.sqrt(F.when(var > 0, var)), 6)

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
