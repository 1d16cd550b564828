"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Schema (BASELINE.json ``input_hint``):
  conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string (nullable), ts:timestamp

Every value is a pure function of ``(seed, conv_index, turn_idx)`` —
independent of partitioning, task order, or parallelism — so golden
fixtures generated on the driver bit-match engine inputs generated
distributed.  Turn counts are Zipf-flavored (a few conversations are
10^3-10^4x hotter) to exercise the salted-rollup skew path, and
inter-arrival gaps are a bursty mixture with seeded dropouts to
exercise gap-fill/as-of interpolation.

Reference analogue: the 20 ragged comp-engine series of
``/root/reference/test_a.py:27-38`` — here replaced by a scalable,
seeded generator (the reference dataset is a fixed CSV; we need
SF-parameterized volume).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROLES = np.array(["user", "assistant", "tool"])
TOOL_VOCAB = np.array(["search", "bash", "read_file", "write_file", "browser", "sql"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark rollup tier gorilla "
    "delta conversation turn agent tool query window aggregate shuffle "
    "partition skew salt checkpoint resume lineage metric entropy".split()
)

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def conv_turn_count(conv_index: int, sf: float, seed: int = 42) -> int:
    """Zipf-ish deterministic turn count: rank-1 conv gets ~10^3-10^4x
    the tail.  Pure function of (conv_index, seed)."""
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(conv_index))
    base = 8 + int(rng.integers(0, 8))
    hot = int(20000.0 * sf / (1.0 + conv_index) ** 0.9)
    return max(4, base + hot)


def num_convs(sf: float) -> int:
    return max(8, int(1000 * sf / 0.001))


_WLEN = np.array([len(w) for w in _WORDS])


def gen_conv(conv_index: int, sf: float, seed: int = 42,
             text_mode: str = "full") -> pd.DataFrame:
    """All turns of one conversation as a pandas DataFrame.

    Deterministic: one RNG seeded only by (seed, conv_index).
    ``text_mode='light'`` replaces each text with an 'x'*L string of the
    IDENTICAL byte length (consuming the same RNG draws), so every
    derived series is bit-identical while generation is ~10x faster —
    used for bench-scale inputs where text bytes are never read."""
    n = conv_turn_count(conv_index, sf, seed)
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(7_654_321) + np.uint64(conv_index))

    turn_idx = np.arange(n, dtype=np.int32)
    # role: cycle user/assistant with seeded jitter; ~12% tool turns
    role_ix = turn_idx % 2
    jitter = rng.random(n)
    role_ix = np.where(jitter < 0.12, 2, role_ix)
    roles = ROLES[role_ix]

    # text: deterministic pseudo-text, lognormal word count. Exact bytes
    # matter (per-turn text-equality invariant) -> built from seeded ints.
    wc = np.clip(rng.lognormal(2.2, 0.8, n).astype(int), 1, 400)
    word_ids = rng.integers(0, len(_WORDS), int(wc.sum()))
    offsets = np.concatenate([[0], np.cumsum(wc)])
    if text_mode == "full":
        texts = [
            " ".join(_WORDS[word_ids[offsets[i] : offsets[i + 1]]]) for i in range(n)
        ]
    else:  # light: same lengths (sum of word lens + separators), cheap bytes
        seg_lens = np.add.reduceat(_WLEN[word_ids], offsets[:-1]) + (wc - 1)
        texts = ["x" * int(L) for L in seg_lens]

    # tool: NULL except ~15% of assistant turns
    tool_draw = rng.random(n)
    tool_name = TOOL_VOCAB[rng.integers(0, len(TOOL_VOCAB), n)]
    tools = np.where((roles == "assistant") & (tool_draw < 0.15), tool_name, None)

    # ts: conv start + bursty cumulative gaps (2s / 30s / 20min mixture)
    # with seeded dropouts (a gap multiplied 50x) to exercise gap-fill.
    start_us = np.int64(conv_index) * 97_000_000 % (86_400_000_000 * 30)
    mix = rng.random(n)
    gaps = np.where(mix < 0.6, 2.0, np.where(mix < 0.9, 30.0, 1200.0))
    gaps = gaps * (0.5 + rng.random(n))
    dropout = rng.random(n) < 0.02
    gaps = np.where(dropout, gaps * 50.0, gaps)
    ts = EPOCH + np.timedelta64(1, "us") * (
        start_us + np.cumsum((gaps * 1e6).astype(np.int64))
    )

    return pd.DataFrame(
        {
            "conv_id": f"conv{conv_index:08d}",
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def gen_turns_pandas(sf: float, seed: int = 42, max_convs: int | None = None,
                     text_mode: str = "full") -> pd.DataFrame:
    """Driver-side generation (fixtures / small tests)."""
    k = num_convs(sf) if max_convs is None else min(num_convs(sf), max_convs)
    return pd.concat(
        [gen_conv(i, sf, seed, text_mode) for i in range(k)], ignore_index=True
    )


def gen_turns(spark: SparkSession, sf: float, seed: int = 42,
              text_mode: str = "full") -> DataFrame:
    """Distributed generation: spark.range over conv indices ->
    mapInPandas producing each conversation's turns.  Because each
    conversation derives from its own RNG, output is identical under
    any partitioning — the property that lets fixtures transfer."""
    k = num_convs(sf)

    def gen_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for conv_index in pdf["id"].tolist():
                yield gen_conv(int(conv_index), sf, seed, text_mode)

    # One conversation may be huge (Zipf head): spread indices evenly.
    n_parts = min(k, 64)
    return (
        spark.range(0, k, numPartitions=n_parts)
        .mapInPandas(gen_partition, schema=TURNS_SCHEMA)
    )
