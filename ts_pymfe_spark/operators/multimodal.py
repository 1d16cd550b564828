"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Engine addition (task brief): at 100 TB the media pipeline is
schema + partitioning + batch shape — the Spark side — plus a decode
kernel that is a library call per batch.  The image/audio libraries are
not in this container, so the decode step is STUBBED behind
``NotImplementedError`` with a deterministic fake for tests; everything
around it (schemas, batch iteration, partition sizing, output contract)
is real and tested.

Scale notes:
  - media rows are large: ``repartition_for_media`` targets
    ~``batch_mb`` of payload per Arrow batch so a decode UDF never
    materializes more than a bounded byte volume;
  - metadata travels in fixed typed columns (no per-row JSON parsing in
    the hot path);
  - decode outputs are fixed-size feature vectors — downstream joins
    aggregate on ids, never on blobs.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, feature array<float>"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: seeded binary payloads
    with plausible metadata."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(100, 60000)) if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode would be PIL/libvips; not installed in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not available in this "
        "environment); use fake_decode for tests"
    )


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in: a dim-length float signature derived from
    payload bytes (byte-histogram projections).  Stable across workers."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    hist /= max(1.0, hist.sum())
    return hist.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)


def repartition_for_media(df: DataFrame, batch_mb: int = 64,
                          avg_row_kb: int = 512,
                          est_rows: int | None = None) -> DataFrame:
    """Bound the payload bytes an Arrow batch carries.

    No data pass: at 100 TB an extra ``df.count()`` just to size
    partitions is a full scan of a blob table.  The real lever is the
    Arrow batch size — ``maxRecordsPerBatch`` rows/batch × avg_row_kb
    must stay under batch_mb — which needs only arithmetic.  When the
    caller knows the row count (Iceberg snapshot metadata / manifest
    row counts are free), ``est_rows`` additionally right-sizes the
    partition count; otherwise the input partitioning is kept (scan
    tasks are already byte-bounded by files.maxPartitionBytes)."""
    rows_per_batch = max(1, (batch_mb * 1024) // avg_row_kb)
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(rows_per_batch)
    )
    if est_rows is not None:
        return df.repartition(max(1, est_rows // rows_per_batch))
    return df


def extract_media_features(df: DataFrame,
                           decode: Callable[[bytes], np.ndarray] = fake_decode,
                           ) -> DataFrame:
    """mapInPandas decode/feature-extract: (media table) ->
    (media_id, kind, n_bytes, feature vector).  Narrow — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                try:
                    feats.append(decode(bytes(payload)).tolist())
                except NotImplementedError:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (decode stubbed).  Demonstrates the explode-by-schedule pattern —
    the frame grid is computed relationally, the decoder only ever sees
    (media_id, frame_ts) work units."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
