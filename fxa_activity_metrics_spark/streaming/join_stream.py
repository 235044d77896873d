"""Stream-stream time-range join (§2.9): correlate two live event
streams on a key within an event-time window — the last streaming
join shape the engine's matrix was missing (micro-batch enrichment,
stateful sessionization, and streaming sinks are covered elsewhere).

Semantics and scale:

- INNER time-interval joins emit each match as soon as both sides
  have arrived (no watermark wait on the output path); the
  watermarks' job here is STATE EVICTION — each side buffers only
  rows young enough to still find a partner, so state is bounded by
  (rate × (watermark delay + join window)) instead of growing
  forever. Without both watermarks + a range condition Spark
  rightly refuses the query.
- The join itself shuffles both streams on the key like any
  equi-join; the time-range residual filters key-matched candidates
  only. At 100 TB/day this is the standard click/impression
  attribution shape.
- Late rows beyond the watermark are dropped by the source-side
  eviction — the same contract as the windowed-aggregate streams,
  pinned in tests by comparing against a batch join RESTRICTED to
  the non-late rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

A_SCHEMA = T.StructType(
    [
        T.StructField("a_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("a_ts", T.TimestampType()),
    ]
)
B_SCHEMA = T.StructType(
    [
        T.StructField("b_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("b_ts", T.TimestampType()),
    ]
)


def correlate(
    a: DataFrame,
    b: DataFrame,
    window_seconds: int = 600,
) -> DataFrame:
    """The join shared by stream and batch (the stream == batch
    oracle pattern): b-events matched to a-events of the same user
    with b_ts in [a_ts, a_ts + window]. Column-name based so either
    static or streaming frames compose."""
    return a.join(
        b,
        on=[
            a["user_id"] == b["user_id"],
            b["b_ts"] >= a["a_ts"],
            b["b_ts"] <= a["a_ts"] + F.expr(f"INTERVAL {window_seconds} SECONDS"),
        ],
    ).select(
        a["user_id"], F.col("a_id"), F.col("a_ts"), F.col("b_id"), F.col("b_ts")
    )


def run_correlation_stream(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_seconds: int = 600,
    watermark: str = "30 minutes",
):
    """Join two JSON file streams within the event-time window and
    append matches to a parquet sink. Returns the started query."""
    a = (
        spark.readStream.schema(A_SCHEMA)
        .json(a_dir)
        .withWatermark("a_ts", watermark)
    )
    b = (
        spark.readStream.schema(B_SCHEMA)
        .json(b_dir)
        .withWatermark("b_ts", watermark)
    )
    return (
        correlate(a, b, window_seconds)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
