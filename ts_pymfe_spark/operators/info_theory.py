"""Information-theory feature family — SQL-expressible members.

Reference: ``/root/reference/tspymfe/info_theory.py``.  The histogram
entropies are pure bucket-count SQL (``info_theory.py:221-316``); the
AMI family needs only a lag + 1-D/2-D bucket counts
(``info_theory.py:148-218``).  The O(n²) entropies (ApEn/SampEn) live
in arrow_kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ts_pymfe_spark.operators.sequence import W_CONV, W_SERIES, discretize_col


def hist_entropy(df: DataFrame, num_bins: int = 10,
                 value: str = "value") -> DataFrame:
    """Normalized Shannon entropy of the equal-width histogram
    (``info_theory.py:221-255``: scipy entropy of np.histogram counts,
    normalized by log(num_bins)).  Natural log, p_i = c_i/n.

    One row per conv_id: (conv_id, hist_entropy)."""
    base = df.withColumn("_b", discretize_col(value, num_bins))
    counts = base.groupBy("conv_id", "_b").agg(F.count("*").alias("_c"))
    n = Window.partitionBy("conv_id")
    p = F.col("_c") / F.sum("_c").over(n)
    return (
        counts.withColumn("_p", p)
        .groupBy("conv_id")
        .agg(
            (-F.sum(F.col("_p") * F.log("_p")) / F.log(F.lit(float(num_bins))))
            .alias("hist_entropy")
        )
    )


def ami_histogram(df: DataFrame, lag: int = 1, num_bins: int = 64,
                  value: str = "value") -> DataFrame:
    """Auto-mutual information at one lag via joint 2-D histogram
    (``info_theory.py:148-218``): I = H(x) + H(x_lag) − H(x, x_lag),
    natural log, equal-width bins over each margin's own range.

    One row per conv_id: (conv_id, ami)."""
    lagged = df.withColumn("_y", F.lag(value, lag).over(W_SERIES())).filter(
        F.col("_y").isNotNull()
    )
    # margin bins computed over the *aligned* halves, matching the
    # reference (np.histogram2d over x[:-lag], x[lag:])
    wc = Window.partitionBy("conv_id")
    def bucket(col: str) -> F.Column:
        v, mn, mx = F.col(col), F.min(col).over(wc), F.max(col).over(wc)
        raw = F.floor((v - mn) / ((mx - mn) / num_bins))
        # zero-range margin -> single bin (np.histogram2d semantics;
        # ANSI divide-by-zero guard, round 4)
        return F.when(mx > mn, F.least(raw, F.lit(num_bins - 1))).otherwise(
            F.lit(0)
        ).cast("int")

    bb = lagged.select(
        "conv_id", bucket(value).alias("_bx"), bucket("_y").alias("_by")
    )
    joint = bb.groupBy("conv_id", "_bx", "_by").agg(F.count("*").alias("_c"))
    n = Window.partitionBy("conv_id")
    p = (F.col("_c") / F.sum("_c").over(n)).alias("_p")
    joint = joint.select("conv_id", "_bx", "_by", p)
    # Single-pass marginalization (round 7): the old hx/hy/hxy subtrees
    # were three independent DataFrame branches joined on conv_id —
    # Catalyst does not share common lineage across branches, so the
    # scan + lag window + joint histogram all ran THREE times (plan
    # audit: 3 scans, 10 exchanges).  Instead explode each joint cell
    # into its three marginal keys (x margin, y margin, joint), sum p
    # per (axis, key), take each axis's entropy, and combine — one
    # scan, one exchange, no joins.  The xy axis key is unique per
    # cell, so its sum(p) is p exactly and H(x,y) is unchanged.
    axes = F.array(
        F.struct(F.lit(0).alias("_ax"), F.col("_bx").alias("_k")),
        F.struct(F.lit(1).alias("_ax"), F.col("_by").alias("_k")),
        F.struct(
            F.lit(2).alias("_ax"),
            (F.col("_bx") * num_bins + F.col("_by")).alias("_k"),
        ),
    )
    cells = joint.select(
        "conv_id", "_p", F.explode(axes).alias("_a")
    ).select("conv_id", F.col("_a._ax").alias("_ax"),
             F.col("_a._k").alias("_k"), "_p")
    marg = cells.groupBy("conv_id", "_ax", "_k").agg(
        F.sum("_p").alias("_pm")
    )
    ent = marg.groupBy("conv_id", "_ax").agg(
        (-F.sum(F.col("_pm") * F.log("_pm"))).alias("_h")
    )
    return ent.groupBy("conv_id").agg(
        (
            F.sum(F.when(F.col("_ax") == 0, F.col("_h")))
            + F.sum(F.when(F.col("_ax") == 1, F.col("_h")))
            - F.sum(F.when(F.col("_ax") == 2, F.col("_h")))
        ).alias("ami")
    )


def hist_ent_out_diff(df: DataFrame, p: float = 0.05, num_bins: int = 10,
                      value: str = "value") -> DataFrame:
    """ft_hist_ent_out_diff as pure SQL (``info_theory.py:258-316``;
    Arrow kernel twin: operators/arrow_kernels._hist_ent_out_diff):
    H(full) − H(values within the [p, 1−p] quantile band), both the
    normalized histogram entropy above.  Spark ``percentile`` and
    DuckDB ``quantile_cont`` share linear interpolation bit-for-bit,
    so the trim boundary is engine-stable.

    One row per conv_id: (conv_id, hist_ent_out_diff)."""
    full = hist_entropy(df, num_bins, value).withColumnRenamed(
        "hist_entropy", "_h_full"
    )
    qs = df.groupBy("conv_id").agg(
        F.percentile(value, p).alias("_lo"),
        F.percentile(value, 1 - p).alias("_hi"),
    )
    inner = (
        df.join(qs, "conv_id")
        .filter((F.col(value) >= F.col("_lo")) & (F.col(value) <= F.col("_hi")))
    )
    # degenerate-trim guard (round-4 ADVICE fix): the Arrow kernel twin
    # returns nan when the trimmed set has < 2 values; the SQL form's
    # nan contract is "no row", so drop those conversations here to
    # keep the two paths aligned on tiny / heavily-tied series.
    big_enough = (
        inner.groupBy("conv_id").agg(F.count("*").alias("_nin"))
        .filter(F.col("_nin") >= 2).select("conv_id")
    )
    trimmed = hist_entropy(inner, num_bins, value).withColumnRenamed(
        "hist_entropy", "_h_inner"
    ).join(big_enough, "conv_id")
    return full.join(trimmed, "conv_id").select(
        "conv_id",
        (F.col("_h_full") - F.col("_h_inner")).alias("hist_ent_out_diff"),
    )


def dw_stat(df: DataFrame, value: str = "value") -> DataFrame:
    """Durbin-Watson statistic scaled to [0,1] as the reference does
    (``stat_tests.py:29-69``: statsmodels durbin_watson / 4):
    (Σ(Δx)²/Σx²) / 4."""
    d = F.col(value) - F.lag(value, 1).over(W_SERIES())
    base = df.withColumn("_d", d)
    return base.groupBy("conv_id").agg(
        (
            F.sum(F.col("_d") * F.col("_d"))
            / F.sum(F.col(value) * F.col(value))
            / 4.0
        ).alias("dw")
    )
