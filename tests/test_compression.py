"""Gorilla segment codec: bit-exact round-trips, standalone and through
the Spark compress/decompress operators (SURVEY §5.2 item 3 analogue:
raw -> compressed -> decompressed equality under stable ordering)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from ts_pymfe_spark.functions.gorilla import decode_segment, encode_segment
from ts_pymfe_spark.operators.compression import (
    compress_segments,
    decompress_segments,
)
from ts_pymfe_spark.operators.derive import series_of


def test_codec_roundtrip_property():
    rng = np.random.default_rng(7)
    for _ in range(8):
        n = int(rng.integers(0, 3000))
        gaps = (rng.choice([2e6, 30e6, 1.2e9], n) * (0.5 + rng.random(n))).astype(
            np.int64
        )
        ts = np.cumsum(gaps) + 1_700_000_000_000_000
        v = np.round(rng.standard_normal(n) * 100, 2)
        if n:
            v[rng.random(n) < 0.3] = v[0]  # repeated values: xor==0 path
            v[rng.random(n) < 0.05] = np.nan  # NaN bits preserved
        ts2, v2 = decode_segment(encode_segment(ts, v))
        np.testing.assert_array_equal(ts, ts2)
        np.testing.assert_array_equal(v.view(np.uint64), v2.view(np.uint64))


def test_spark_compress_roundtrip(spark, turns):
    pts = series_of(turns, "text_len").withColumn("series", F.lit("text_len"))
    segs = compress_segments(pts.select("conv_id", "series", "ts", "value"), "1d")
    back = decompress_segments(segs)
    a = (
        pts.select("conv_id", "ts", "value")
        .orderBy("conv_id", "ts")
        .toPandas()
    )
    b = back.select("conv_id", "ts", "value").orderBy("conv_id", "ts").toPandas()
    assert len(a) == len(b)
    pd.testing.assert_series_equal(a["value"], b["value"], check_exact=True)
    assert (a["ts"].values == b["ts"].values).all()
    # segments actually compress vs 16 bytes/point raw
    sizes = segs.toPandas()
    total_points = sizes["n"].sum()
    total_bytes = sizes["seg"].map(len).sum()
    assert total_bytes < 16 * total_points
