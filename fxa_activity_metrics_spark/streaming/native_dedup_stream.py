"""Native watermark-bounded streaming deduplication (§2.9):
`dropDuplicatesWithinWatermark` — Spark's built-in stateful dedup —
as the complement to the engine's foreachBatch keeper-state dedup
(`streaming/dedup_stream.py`).

Why both exist: the keeper-state pipeline deduplicates against ALL
history (its state is the persisted content-hash table, so a dup
arriving months later is still dropped). The native operator bounds
state by event time instead — a duplicate is dropped only if it
arrives within the watermark delay of the first copy — which is the
right trade at 100 TB/day ingest where unbounded dedup state would
grow forever and near-in-time duplicates (retries, at-least-once
sources, double-fires) are the actual failure mode. State size is
rate × delay, evicted by the engine, no table maintenance.

Contract pinned in tests: within-delay duplicates collapse to the
FIRST arrival's row; copies separated by more than the delay are
both kept (documented semantics, not a bug); restart from the
checkpoint neither re-emits nor re-drops.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def run_native_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "30 minutes",
):
    """Stream JSON doc-events, drop content duplicates arriving
    within ``delay`` of the first copy (keyed on the text's md5),
    append survivors to a parquet sink. Returns the started query."""
    docs = (
        spark.readStream.schema(DOC_EVENT_SCHEMA)
        .json(source_dir)
        .withColumn("content_hash", F.md5("text"))
        .withWatermark("ts", delay)
    )
    return (
        docs.dropDuplicatesWithinWatermark(["content_hash"])
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
