"""Table profiling: per-column row/null counts and sketched distinct
cardinality in one narrow pass.

Engine addition (no reference counterpart): the first question against
an unfamiliar 100 TB table is "how many rows / nulls / distincts per
column" — and ``count(distinct c1), count(distinct c2), ...`` plans an
Expand (one input copy per column) with a full-width shuffle.  This
profiler unpivots to (column, value-as-string) rows — narrow, scan
stays columnar-pruned to the requested columns — counts nulls with a
map-side partial, and estimates distincts with the register-bounded
HLL sketch: the shuffle is O(columns x 2^p) regardless of table size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_pymfe_spark.operators.sketches import hll_distinct


def profile_table(df: DataFrame, columns: Sequence[str] | None = None,
                  p: int = 10) -> DataFrame:
    """-> one row per profiled column:
    (column, n_rows, n_null, est_distinct).

    Values hash as their canonical string form (the same cast both the
    sketch and any SQL oracle apply), so numerically-equal-but-
    distinct-typed values collide deliberately.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    pairs = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    staged = df.select(
        F.stack(F.lit(len(cols)), *pairs).alias("column", "value"))
    counts = staged.groupBy("column").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long").alias("n_null"),
    )
    distinct = hll_distinct(staged, ["column"], "value", p=p) \
        .select("column", "est_distinct")
    return counts.join(distinct, "column", "left").select(
        "column", "n_rows", "n_null",
        F.coalesce("est_distinct", F.lit(0.0)).alias("est_distinct"))
