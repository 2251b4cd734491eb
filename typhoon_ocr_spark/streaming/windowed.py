"""Watermarked event-time windowed aggregation over a stream.

The reference has no event-time semantics (its SSE stream is
processing-order progress, SURVEY.md §2.7); this is the engine's
late-data-correct streaming rollup for the events stream: tumbling
1-hour windows with a watermark, emitted in append mode once a window
can no longer receive late rows. The batch twin is
operators/relational.events_hourly (same grouping, oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_counts_stream(
    event_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming (ts, event_type, value) → per-hour per-type counts and
    sums; rows older than ``watermark`` behind the max seen event time
    are dropped as late, and windows finalize (append-mode emit) once
    the watermark passes their end."""
    return (
        # parquet NTZ timestamps → session-tz TIMESTAMP (UTC session ⇒
        # wall-clock preserving); watermarks require the tz-aware type
        event_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_hourly_stream(
    spark: SparkSession,
    events_path: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> None:
    """Drain an events parquet directory through the watermarked window
    into a parquet sink (append mode — only finalized windows land)."""
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_path)
    )
    query = (
        hourly_event_counts_stream(stream, watermark)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    query.awaitTermination()
