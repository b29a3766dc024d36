"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.4) — its
"dynamic" clusterers are in-memory incremental updates.  The engine's
streaming surface therefore covers the ingestion side of the pipeline:
the same declarative transformations used in batch (hourly rollups,
quality stats over arriving documents) run unchanged as streaming
queries; batch/stream parity is asserted in tests.

At production scale: readStream from the object store / Kafka,
watermark on event time, and foreachBatch into the edge table, after
which the iterative graph operators run on the refreshed snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_rollup(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Tumbling 1-hour window count/sum per event_type.  Works on both
    batch DataFrames and streaming DataFrames; streaming gets a
    watermark for state cleanup."""
    e = events
    if watermark and e.isStreaming:
        # watermarks require TIMESTAMP (event time); parquet may carry NTZ
        if dict(e.dtypes).get("ts") == "timestamp_ntz":
            e = e.withColumn("ts", F.col("ts").cast("timestamp"))
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total")
    )


def streaming_document_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality features as a streaming map — identical
    expression tree to functions.text.text_stats."""
    from graph_mining_spark.functions.text import text_stats

    return text_stats(docs)
