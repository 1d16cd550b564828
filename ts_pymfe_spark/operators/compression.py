"""Columnar segment compression for tier storage: Gorilla XOR values +
delta-of-delta timestamps inside vectorized Arrow UDFs (north rule; no
per-row Python — each UDF call processes a whole Arrow batch of
segments).

Storage shape: one BinaryType segment per (conv_id, series,
segment_bucket) holding all (ts, value) points of that bucket, ordered
by ts.  At 100 TB this turns the raw-tier point table into a segment
table ~10-100x smaller (real rollup series are slowly-varying, unlike
the random-data worst case), and the segment key is the same
(conv, bucket) key the tier cascade shuffles on — compression rides an
existing exchange, adding none.

Round-trip is bit-exact (IEEE bits preserved incl. NaN/-0.0), which is
what lets the per-turn text-equality / value-equality invariant hold
through storage (BASELINE.json input_hint).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_pymfe_spark.functions.gorilla import decode_segment, encode_segment

SEGMENT_SCHEMA = (
    "conv_id string, series string, bucket_start timestamp, "
    "n int, seg binary"
)
POINTS_SCHEMA = "conv_id string, series string, ts timestamp, value double"


def compress_segments(series_df: DataFrame, tier: str = "1h") -> DataFrame:
    """(conv_id, series, ts, value) -> one Gorilla segment per
    (conv_id, series, date_trunc(tier) bucket).

    groupBy+applyInPandas: the shuffle key equals the tier key, so when
    chained after ``rollup_raw`` Catalyst reuses the exchange."""
    from ts_pymfe_spark.operators.rollup import TIERS

    bucketed = series_df.withColumn(
        "bucket_start", F.date_trunc(TIERS[tier], "ts")
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        vals = pdf["value"].to_numpy(dtype=np.float64)
        seg = encode_segment(ts_us, vals)
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "series": [pdf["series"].iloc[0]],
                "bucket_start": [pdf["bucket_start"].iloc[0]],
                "n": [len(pdf)],
                "seg": [seg],
            }
        )

    return bucketed.groupBy("conv_id", "series", "bucket_start").applyInPandas(
        encode, SEGMENT_SCHEMA
    )


def decompress_segments(segments: DataFrame) -> DataFrame:
    """Segments -> points, bit-exact inverse of compress_segments.
    mapInPandas (narrow — no shuffle): each batch of segments explodes
    into its points."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                ts_us, vals = decode_segment(bytes(row["seg"]))
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": row["conv_id"],
                            "series": row["series"],
                            "ts": ts_us.astype("datetime64[us]"),
                            "value": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return segments.mapInPandas(decode, POINTS_SCHEMA)
