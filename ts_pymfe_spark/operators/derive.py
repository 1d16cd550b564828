"""Transcript table -> per-conversation derived series (long format).

The reference consumes one 1-D float array (``_internal.py:1334-1364``).
Our input is the transcript table ``(conv_id, turn_idx, role, text,
tool, ts)``; the engine derives the per-conversation series the north
rule names:

  - ``text_len``  — length(text) per turn (a per-event value series)
  - ``tool_flag`` — 1.0 when the turn invoked a tool else 0.0 (its
                    bucket sums are the tool-invocation counts)
  - ``turn_rate`` — turns per time bucket (emerges as the rollup's
                    ``n`` column; see operators/rollup.py)

Long format ``(conv_id, series, turn_idx, ts, value)`` keeps every
downstream operator generic: one Window spec / one groupBy serves all
series, and adding a series is a row-space change, not a schema change
(the 100 TB-friendly choice — no wide-table rewrite to add a metric).

All expressions are native Column ops -> whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: value series derived 1:1 from turns (turn_rate is rollup-emergent)
TURN_SERIES = ("text_len", "tool_flag")


def derive_series(turns: DataFrame) -> DataFrame:
    """(conv_id, series, turn_idx, ts, value) — one row per turn per series.

    ``stack`` (UNPIVOT) is a narrow transformation: no shuffle, fully
    pushed into the scan projection (only text-length and tool nullity
    are read; Catalyst prunes role/text bytes at the parquet reader
    when upstream allows).
    """
    base = turns.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").cast("double").alias("text_len"),
        F.when(F.col("tool").isNotNull(), 1.0).otherwise(0.0).alias("tool_flag"),
    )
    n = len(TURN_SERIES)
    stack_expr = ", ".join(f"'{s}', {s}" for s in TURN_SERIES)
    return base.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.expr(f"stack({n}, {stack_expr}) as (series, value)"),
    )


def series_of(turns: DataFrame, series: str) -> DataFrame:
    """Single derived series as (conv_id, turn_idx, ts, value)."""
    if series == "text_len":
        v = F.length("text").cast("double")
    elif series == "tool_flag":
        v = F.when(F.col("tool").isNotNull(), 1.0).otherwise(0.0)
    else:
        raise ValueError(f"unknown turn-level series: {series}")
    return turns.select("conv_id", "turn_idx", "ts", v.alias("value"))
