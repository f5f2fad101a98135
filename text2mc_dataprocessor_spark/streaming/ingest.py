"""Structured-Streaming ingestion for discovered pages / crawl events.

The reference has no streaming (SURVEY §2.8) — its crawl is an
iterative batch loop, which plans/crawl.py keeps. This module covers
the streaming-shaped capabilities a production deployment of the same
pipeline needs: a WARC-drop/event firehose landing as files, windowed
fetch metrics with late-data handling, and a streaming version of the
extraction stage. All standard Structured Streaming — file source →
transformations → sink, with watermarks; tested with
``Trigger.AvailableNow`` so tests are deterministic and bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import extract_detail_udf

PAGES_STREAM_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_fetch_metrics(pages: DataFrame, window: str = "1 minute",
                           watermark: str = "2 minutes") -> DataFrame:
    """Per-host fetch counts in event-time windows with late-data
    tolerance — the streaming analog of the lineage metrics table."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html")).alias("bytes_fetched"),
        )
        .select("w.start", "w.end", "host", "n_pages", "bytes_fetched")
    )


def streaming_extract(pages: DataFrame) -> DataFrame:
    """The extraction stage as a streaming transformation — identical
    UDF, identical byte-for-byte output as the batch path."""
    return pages.withColumn("d", extract_detail_udf("url", "html")).select(
        "url",
        "warc_ts",
        F.col("d.tags").alias("tags"),
        F.col("d.image_url").alias("image_url"),
        F.col("d.download_url").alias("download_url"),
    )


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Drain everything currently available to parquet, then stop —
    deterministic micro-batch execution for tests and backfills."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def run_available_now_complete(agg_df: DataFrame, checkpoint_dir: str):
    """Drain a windowed aggregation to an in-memory sink (complete mode);
    returns the query name for ``spark.table`` lookup."""
    name = "stream_metrics_out"
    q = (
        agg_df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("complete")
        .start()
    )
    q.awaitTermination()
    return name
