"""Structured Streaming surface: incremental event rollups.

The reference has no streaming (time `t` is a coordinate dimension, not
event time — SURVEY.md §2.3); this is engine-side surface for the
training-data pipeline: the same hourly rollup the batch query
``events_hourly`` computes, expressed as readStream -> watermarked windowed
aggregation -> sink, so a continuously-arriving events feed (or an Iceberg
table consumed incrementally by snapshot) produces identical results to the
batch query over the same data.

Scale notes: the aggregation state is keyed by (window, event_type) —
bounded by the watermark horizon; shuffle partitions size the state store;
late rows beyond the watermark are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, payload string")


def read_event_stream(spark, src_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-based stream over a directory of events parquet files (the
    local stand-in for a Kafka topic / Iceberg incremental read)."""
    return (spark.readStream
            .schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(src_dir))


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked hourly rollup; schema mirrors the batch events_hourly
    query so streaming output can be checked against the batch oracle."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("hour_start"), "event_type",
                    "n_events", "sum_value"))


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drive the stream into an in-memory table until exhausted."""
    q = (stream_df.writeStream.outputMode(mode)
         .format("memory").queryName(name)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
