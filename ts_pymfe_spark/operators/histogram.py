"""Fixed-grid histogram sketches and histogram quantiles
(PromQL ``histogram_quantile`` semantics), pure Spark SQL.

Engine addition (no reference counterpart): exact per-group quantiles
need a full sort of every group; at 100 TB the scale-honest form is a
mergeable sketch.  A fixed-grid histogram is the deterministic one —
unlike t-digest/KLL its state is a pure function of the input SET
(bin counts), so sketches merge by plain ``sum`` in any order, persist
in the tier store exactly like the moment vectors, and every estimate
is bit-reproducible in a second engine (the DuckDB oracle replays the
identical pipeline).

Estimator (PromQL convention): target rank ``r = q * N``; walk the
cumulative counts to the first bin with ``cum >= r``; interpolate
linearly inside it::

    est = lo + width * (bin + (r - cum_before) / bin_count)

Values are clamped to [lo, hi] before binning (open-ended buckets
collapse onto the edge bins) and the error is bounded by one bin
width — the documented, fixed trade-off of the fixed grid.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(df: DataFrame, keys: Sequence[str], value_col: str,
                     lo: float, hi: float, bins: int = 64) -> DataFrame:
    """Per-group bin counts: (keys..., bin, cnt); zero bins absent.

    One exchange with a map-side partial count — the shuffle carries at
    most ``groups x bins`` rows per task no matter the input size.
    """
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / bins
    v = F.least(F.greatest(F.col(value_col).cast("double"), F.lit(lo)),
                F.lit(hi))
    b = F.least(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(bins - 1))
    return (df.filter(F.col(value_col).isNotNull())
            .select(*keys, b.alias("bin"))
            .groupBy(*keys, "bin")
            .agg(F.count("*").cast("long").alias("cnt")))


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches over the same grid: sum per (keys, bin) — exact
    and order-free (integer counts)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("bin", "cnt")]
    return out.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def _q_col_name(q: float) -> str:
    """p50 for integral percents (unchanged from earlier rounds),
    p99_5 / p0_05 for fractional ones — unique per distinct q."""
    pct = q * 100
    if pct == int(pct):
        return f"p{int(pct)}"
    return "p" + (f"{pct:.10f}".rstrip("0").replace(".", "_"))


def histogram_quantile(sketch: DataFrame, keys: Sequence[str],
                       qs: Sequence[float], lo: float, hi: float,
                       bins: int = 64) -> DataFrame:
    """Quantile estimates from a sketch: (keys..., n, p<q>...).

    The cumulative window partitions by the group keys, so the final
    aggregate reuses its partitioning (subset rule) — one exchange of
    O(groups x bins) sketch rows total.

    Column names derive from the FULL q value — p50, p99_5, p0_05 —
    never the rounded percent (ADVICE r5: 0.995 and 1.0 both rounded
    to "p100" and the later estimate silently overwrote the earlier);
    duplicate qs raise.
    """
    names = [_q_col_name(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile column names: {names}")
    width = (hi - lo) / bins
    w = (Window.partitionBy(*keys).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy(*keys)
    s = (sketch
         .withColumn("cum", F.sum("cnt").over(w))
         .withColumn("n", F.sum("cnt").over(wn)))
    aggs = [F.max("n").cast("long").alias("n")]
    for i, q in enumerate(qs):
        r = F.lit(float(q)) * F.col("n")
        hit = F.min(F.when(F.col("cum") >= r,
                           F.struct("bin", "cum", "cnt"))).alias(f"_h{i}")
        aggs.append(hit)
    out = s.groupBy(*keys).agg(*aggs)
    for i, q in enumerate(qs):
        h = f"_h{i}"
        bin_c = F.col(h).getField("bin")
        cum_c = F.col(h).getField("cum")
        cnt_c = F.col(h).getField("cnt")
        r = F.lit(float(q)) * F.col("n")
        est = (F.lit(lo) + F.lit(width)
               * (bin_c + (r - (cum_c - cnt_c)) / cnt_c))
        out = out.withColumn(names[i], F.round(est, 6) + F.lit(0.0))
    return out.drop(*[c for c in out.columns if c.startswith("_h")])


def histogram_quantiles(df: DataFrame, keys: Sequence[str],
                        value_col: str, qs: Sequence[float],
                        lo: float, hi: float,
                        bins: int = 64) -> DataFrame:
    """Sketch + quantiles in one call."""
    return histogram_quantile(
        histogram_sketch(df, keys, value_col, lo, hi, bins),
        keys, qs, lo, hi, bins)
