"""Streaming exact dedup over a document stream.

Engine addition (task brief: dedup is first-class): the streaming twin
of ``operators.textpipe.exact_dedup``.  A 100 TB ingest does not get
to batch-scan the corpus per arrival — dedup has to ride the stream
with bounded state.

Semantics vs the batch op: the batch survivor is the min-id doc (a
total order exists); the streaming survivor is the FIRST-ARRIVED doc
per content hash — the only rule implementable with O(1) state per
key.  Both emit exactly one doc per distinct content.

Scale shape: ``dropDuplicatesWithinWatermark`` keeps one state row per
distinct hash seen within the watermark horizon and evicts it when the
event-time watermark passes — state is O(distinct content in horizon),
not O(stream history).  The hash is md5, so the state-store partition
key is uniform by construction (no hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_docs(spark: SparkSession, path: str,
                max_files_per_trigger: int = 1) -> DataFrame:
    """File-source document stream (parquet dirs double as queues in
    tests; swap for Kafka in production — the schema is the contract)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def dedup_stream(docs: DataFrame, watermark: str = "1 hour",
                 text: str = "text", ts_col: str = "ts") -> DataFrame:
    """First-arrival exact dedup on a streaming doc frame:
    one output row per distinct ``md5(text)`` within the watermark
    horizon.  ``docs`` must be a streaming DataFrame carrying an
    event-time column ``ts_col``."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
