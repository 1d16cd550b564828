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


def sessionize_stream(turns: DataFrame, gap_seconds: int = 1800,
                      idle_timeout_seconds: int | None = None) -> DataFrame:
    """Conversation sessionizer: a new session starts when the gap to
    the previous turn exceeds ``gap_seconds``.  Cross-microbatch state
    = 3 scalars per conversation.

    Batch-equivalent definition (the test oracle, fully-ordered input):
        session_id = Σ over prior turns of
                     1{ts − lag(ts) > gap_seconds}   (per conv, ts order)

    State bound: for CONTINUOUS deployments pass
    ``idle_timeout_seconds`` (e.g. 86400): conversations idle longer
    than the timeout are EVICTED from the state store
    (ProcessingTimeTimeout), so state is O(#conversations active
    within the horizon), not O(all conversations ever seen).  A
    conversation reappearing after eviction restarts its session
    counter at 0 — its next turn necessarily opens a new session
    anyway (idle_timeout ≥ gap), so only the id's monotone continuity
    is traded for the bound.  The default is ``None`` (NoTimeout,
    exact whole-history counters) because a query with processing-time
    timeouts never runs out of future work: Trigger.AvailableNow
    replays would hang at termination (measured on this Spark build) —
    harmless for a true continuous stream, wrong for bounded replays.

    Late-data contract (bounded disorder, same as the watermarked
    rollup): turns are sorted within each microbatch; a turn arriving
    in a LATER microbatch with an older ts joins the session open at
    arrival and cannot split it (the state's high-water ts is
    monotone: max(last_us, us)), while the session clock keeps running
    from the newest ts seen.  Ts-retroactive assignment would require
    buffering the whole history — that is the batch oracle's job."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
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
                last_us = us if last_us is None else max(last_us, us)
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
        if idle_timeout_seconds is not None:
            state.setTimeoutDuration(idle_timeout_seconds * 1000)
        yield from out

    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_seconds is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def sessionize_batch(turns: DataFrame, gap_seconds: int = 1800,
                     order_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Batch oracle for ``sessionize_stream`` on fully-sorted data —
    one window pass, no state.

    ``order_cols``: pass ("ts", "turn_idx") when ts values can tie —
    a cumulative window over a non-total order is engine-dependent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("conv_id").orderBy(*order_cols)
    # the ts->timestamp hop keeps TIMESTAMP_NTZ sources castable
    # (NTZ -> DOUBLE directly is a DATATYPE_MISMATCH; session tz is UTC)
    sec = F.col("ts").cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    flagged = turns.select(
        "conv_id", "turn_idx", "ts",
        F.when(gap > gap_seconds, 1).otherwise(0).alias("_flag"),
    )
    return flagged.select(
        "conv_id", "turn_idx", "ts",
        F.sum("_flag").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("session_id"),
    )


def session_stats(turns: DataFrame, gap_seconds: int = 1800,
                  order_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Per-session aggregates over ``sessionize_batch``'s assignment
    (round 6): one row per (conv_id, session_id) with turn count,
    start, and duration.

    -> (conv_id, session_id, n_turns, session_start, duration_s)

    Scale shape: the sessionizer's one exchange by conv_id is reused
    by the (conv_id, session_id) aggregation (subset rule) — the whole
    op is a single shuffle of slim turn rows.
    """
    from pyspark.sql import functions as F

    sess = sessionize_batch(turns, gap_seconds, order_cols)
    e = F.col("ts").cast("timestamp").cast("double")
    return (sess.select("conv_id", "session_id", "ts", e.alias("_e"))
            .groupBy("conv_id", "session_id")
            .agg(F.count("*").cast("long").alias("n_turns"),
                 F.min("ts").alias("session_start"),
                 (F.round(F.max("_e") - F.min("_e"), 6)
                  + F.lit(0.0)).alias("duration_s")))


COUNTER_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("increase", T.DoubleType()),
        T.StructField("is_reset", T.BooleanType()),
    ]
)

#: (last_ts_epoch_us, last counter value)
COUNTER_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _pick_timeout(idle_timeout_seconds: int | None,
                  evict_after_seconds: int | None):
    """Timeout wiring shared by the stateful operators: processing-time
    idle timeout (continuous deployments) XOR watermark-driven
    event-time eviction (works under bounded availableNow replays too,
    since the watermark advances with the data)."""
    if idle_timeout_seconds is not None and evict_after_seconds is not None:
        raise ValueError("pass idle_timeout_seconds (processing-time) or "
                         "evict_after_seconds (event-time), not both")
    if idle_timeout_seconds is not None:
        return GroupStateTimeout.ProcessingTimeTimeout
    if evict_after_seconds is not None:
        return GroupStateTimeout.EventTimeTimeout
    return GroupStateTimeout.NoTimeout


def _arm_timeout(state: GroupState, last_us: int | None,
                 idle_timeout_seconds: int | None,
                 evict_after_seconds: int | None) -> None:
    if idle_timeout_seconds is not None:
        state.setTimeoutDuration(idle_timeout_seconds * 1000)
    elif evict_after_seconds is not None:
        # evict when the WATERMARK passes the key's last event time +
        # horizon; the max() keeps the timestamp legal (must exceed the
        # current watermark) for keys already older than the horizon
        last_ms = 0 if last_us is None else last_us // 1000
        state.setTimeoutTimestamp(
            max(last_ms + evict_after_seconds * 1000,
                state.getCurrentWatermarkMs() + 1))


def counter_rate_stream(events: DataFrame,
                        idle_timeout_seconds: int | None = None,
                        evict_after_seconds: int | None = None
                        ) -> DataFrame:
    """Streaming reset-adjusted counter increases (the stateful form
    of ``operators.counters.counter_increase``): cross-microbatch
    state = the key's last (ts, value) — 2 scalars, bounded.

    Emits one row per event with the Prometheus-convention increase
    (forward delta; the new value after a reset; null for a key's
    first-ever sample).  The per-bucket rate rollup downstream is a
    plain mergeable sum — the partials + merge-on-read pattern.

    Ordering contract: per-key time-ordered delivery across
    microbatches (Kafka's partition-by-key guarantee); rows are sorted
    within each batch.  An out-of-order regression would read as a
    counter reset — exactly what Prometheus does in the same case.

    ``idle_timeout_seconds`` bounds state for continuous deployments
    (eviction = the key's next sample counts as first, contributing
    nothing — the Prometheus restart convention); default NoTimeout
    for exactness under bounded ``availableNow`` replays.

    ``evict_after_seconds`` (round 6) is the event-time form: the input
    must carry ``withWatermark('ts', ...)``; a key whose last sample is
    older than the horizon when the watermark passes it is evicted —
    without this, keys never seen again leak 2 scalars forever at
    100 TB key cardinality.  Unlike the processing-time form this fires
    deterministically under availableNow replays (the watermark rides
    the data), so eviction itself is batch-testable.
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_us, last_value = state.get
        else:
            last_us, last_value = None, None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            vals = pdf["value"].to_numpy(dtype=float)
            incs, resets = [], []
            for us, v in zip(ts_us, vals):
                if last_value is None:
                    incs.append(None)
                    resets.append(False)
                elif v < last_value:
                    incs.append(v)
                    resets.append(True)
                else:
                    incs.append(v - last_value)
                    resets.append(False)
                last_us, last_value = int(us), float(v)
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "increase": pd.array(incs, dtype="float64"),
                    "is_reset": resets,
                }
            )
        state.update((last_us, last_value))
        _arm_timeout(state, last_us, idle_timeout_seconds,
                     evict_after_seconds)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=COUNTER_OUTPUT,
            stateStructType=COUNTER_STATE,
            outputMode="append",
            timeoutConf=_pick_timeout(idle_timeout_seconds,
                                      evict_after_seconds),
        )
    )


FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t1", T.TimestampType()),
        T.StructField("t2", T.TimestampType()),
        T.StructField("t3", T.TimestampType()),
        T.StructField("depth", T.IntegerType()),
    ]
)

#: completion-time epoch-us per step (null = step not reached)
FUNNEL_STATE = T.StructType(
    [
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)


def funnel_stream(events: DataFrame, steps: list[str],
                  window_s: float = 86400.0,
                  state_col: str = "event_type",
                  evict_after_seconds: int | None = None) -> DataFrame:
    """Streaming 3-step funnel (stateful form of
    ``operators.funnel.funnel``): state = up to 3 completion
    timestamps per key; each microbatch advances the greedy-earliest
    chain and emits the key's CURRENT (t1, t2, t3, depth) row in
    update mode — downstream consumers keep the latest row per key.

    Chain semantics match the batch operator on per-key time-ordered
    delivery: t1 = first step-1 event; t_k = first step-k event with
    ``ts >= t_{k-1}`` and ``ts <= t1 + window_s`` (equal timestamps
    eligible).  Completion times are monotone under append-only
    arrival, so a batch replay converges to the batch answer.

    ``evict_after_seconds`` (round 6, requires ``withWatermark`` on
    the input): a key idle past the horizon in event time is evicted
    when the watermark passes it.  Pick a horizon >= ``window_s``: an
    open chain past its funnel window can never advance, so eviction
    then only drops state that is already immutable (its latest row
    was emitted when last touched).
    """
    if len(steps) != 3:
        raise ValueError("funnel_stream is specialized to 3 steps")
    win_us = int(window_s * 1_000_000)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        t1, t2, t3 = state.get if state.exists else (None, None, None)
        last_us = None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            st = pdf[state_col].to_numpy()
            for us, s in zip(ts_us, st):
                us = int(us)
                last_us = us if last_us is None else max(last_us, us)
                if t1 is None:
                    if s == steps[0]:
                        t1 = us
                elif t2 is None:
                    if s == steps[1] and t1 <= us <= t1 + win_us:
                        t2 = us
                elif t3 is None:
                    if s == steps[2] and t2 <= us <= t1 + win_us:
                        t3 = us
        state.update((t1, t2, t3))
        _arm_timeout(state, last_us, None, evict_after_seconds)
        depth = 3 if t3 is not None else 2 if t2 is not None \
            else 1 if t1 is not None else 0
        to_ts = (lambda us: None if us is None
                 else pd.Timestamp(us, unit="us"))
        yield pd.DataFrame(
            {"user_id": [key[0]], "t1": [to_ts(t1)], "t2": [to_ts(t2)],
             "t3": [to_ts(t3)],
             "depth": pd.array([depth], dtype="int32")})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_OUTPUT,
            stateStructType=FUNNEL_STATE,
            outputMode="update",
            timeoutConf=_pick_timeout(None, evict_after_seconds),
        )
    )
