"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all; these are the engine additions
the north rule's continuous-aggregate framing implies once turns arrive
as a stream.  Pattern (task brief): per-key state in the streaming
state store, Arrow-batched pandas per microbatch — never per-row
Python.

Scale notes:
  - state is O(#active conversations) × a few scalars — bounded and
    tiny (no per-turn history retained);
  - grouping key = conv_id, the same partitioning axis as everything
    else, so the state shuffle co-locates with the rollup shuffle;
  - sessionization assumes near-ordered arrival per conversation
    (bounded disorder — the same contract as the watermarked rollup);
    the batch oracle in tests/test_plans_streaming.py defines exact
    semantics on fully-sorted data.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_id", T.LongType()),
    ]
)

#: (last_ts_epoch_us, current session id, turns in current session)
SESSION_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_turns", T.LongType()),
    ]
)


def sessionize_stream(turns: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Conversation sessionizer: a new session starts when the gap to
    the previous turn exceeds ``gap_seconds``.  Cross-microbatch state
    = 3 scalars per conversation.

    Batch-equivalent definition (the test oracle):
        session_id = Σ over prior turns of
                     1{ts − lag(ts) > gap_seconds}   (per conv, ts order)
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, session_id, n_turns = state.get
        else:
            last_us, session_id, n_turns = None, 0, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            sids = []
            for us in ts_us:
                us = int(us)
                if last_us is not None and us - last_us > gap_us:
                    session_id += 1
                    n_turns = 0
                last_us = us
                n_turns += 1
                sids.append(session_id)
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": key[0],
                        "turn_idx": pdf["turn_idx"].to_numpy(),
                        "ts": pdf["ts"].to_numpy(),
                        "session_id": sids,
                    }
                )
            )
        state.update((last_us, session_id, n_turns))
        yield from out

    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_batch(turns: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch oracle for ``sessionize_stream`` on fully-sorted data —
    one window pass, no state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("conv_id").orderBy("ts")
    gap = (
        F.col("ts").cast("double")
        - F.lag(F.col("ts").cast("double")).over(w)
    )
    flag = F.when(gap > gap_seconds, 1).otherwise(0)
    return turns.select(
        "conv_id", "turn_idx", "ts",
        F.sum(flag).over(
            Window.partitionBy("conv_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("session_id"),
    )
