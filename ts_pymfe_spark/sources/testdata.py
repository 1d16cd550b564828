"""Readers/adapters for the driver's testdata tables (TESTDATA.md) and
for engine-native transcript tables.

The engine's canonical series shape is ``(conv_id, turn_idx, ts, value)``
(operators/*).  The driver's ``events`` table is the stream-shaped
analogue of a transcript: ``user_id`` is the conversation key,
``event_id`` the stable order key (verified monotone with ts), ``value``
the series.  Adapters are pure projections — Catalyst prunes unused
columns down to the parquet scan.

Iceberg: at production scale the turns table is an Iceberg table
partitioned by days(ts) + bucket(conv_id) (SURVEY §1.4).  This sandbox
has no Iceberg catalog jars, so ``read_turns`` falls back to parquet;
the write path is isolated in plans/manifest.py behind the same gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> canonical series (conv_id, turn_idx, ts, value)."""
    return read(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        "ts",
        F.col("value").cast("double").alias("value"),
    )


def read_turns(spark: SparkSession, path: str) -> DataFrame:
    """Transcript table (input_hint schema) from Iceberg if a catalog is
    configured, else parquet."""
    try:
        return spark.read.format("iceberg").load(path)
    except Exception:
        return spark.read.parquet(path)
