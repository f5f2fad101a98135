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


def stateful_host_budget(pages: DataFrame, budget: int = 1000) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    cumulative per-host fetch accounting across micro-batches — the
    streaming analog of the crawl loop's per-host politeness budget
    (the reference burns a per-host budget inside its sequential loop;
    here the running total lives in the state store, survives restarts
    via the checkpoint, and is keyed/partitioned by host).

    Emits one row per host per micro-batch: running total, this batch's
    rows, and whether the budget is exhausted (downstream dequeue can
    drop or defer over-budget hosts). Update output mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "host string, fetched_total long, batch_rows long, over_budget boolean"
    )
    state_schema = "total long"

    def track(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        total += batch
        state.update((total,))
        yield pd.DataFrame({
            "host": [key[0]],
            "fetched_total": [total],
            "batch_rows": [batch],
            "over_budget": [total > budget],
        })

    keyed = pages.select(
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host")
    )
    return keyed.groupBy("host").applyInPandasWithState(
        track, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_available_now_update(df: DataFrame, checkpoint_dir: str,
                             name: str = "stream_stateful_out"):
    """Drain a stateful/update-mode stream to an in-memory sink."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination()
    return name
