"""Structured Streaming: file-source ingestion, windowed metrics with
watermark, streaming extraction == batch extraction byte-for-byte."""

import pandas as pd
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.functions.extract import extract_detail_udf
from text2mc_dataprocessor_spark.sources.fixtures import pages_to_spark
from text2mc_dataprocessor_spark.streaming import ingest as S


def _land_pages(spark, corpus, tmp_path):
    src = str(tmp_path / "landing")
    pages_to_spark(spark, corpus).write.mode("overwrite").parquet(src)
    return src


def test_streaming_extract_equals_batch(spark, corpus, tmp_path):
    src = _land_pages(spark, corpus, tmp_path)
    stream = S.read_pages_stream(spark, src)
    assert stream.isStreaming
    out_dir = str(tmp_path / "out")
    S.run_available_now(
        S.streaming_extract(stream), out_dir, str(tmp_path / "ckpt")
    )
    got = spark.read.parquet(out_dir)

    batch = pages_to_spark(spark, corpus).withColumn(
        "d", extract_detail_udf("url", "html")
    )
    want = batch.select(
        "url", F.col("d.tags").alias("tags"), F.col("d.image_url").alias("image_url"),
        F.col("d.download_url").alias("download_url"),
    )
    g = got.select("url", "tags", "image_url", "download_url").toPandas().sort_values("url").reset_index(drop=True)
    w = want.toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_windowed_fetch_metrics(spark, corpus, tmp_path):
    src = _land_pages(spark, corpus, tmp_path)
    stream = S.read_pages_stream(spark, src)
    name = S.run_available_now_complete(
        S.windowed_fetch_metrics(stream, window="1 minute", watermark="2 minutes"),
        str(tmp_path / "ckpt2"),
    )
    got = spark.table(name).toPandas()
    assert got.n_pages.sum() == len(corpus.pages)
    # per-host totals match the input
    want = (
        corpus.pages.assign(host=corpus.pages.url.str.extract(r"https://([^/]+)/")[0])
        .groupby("host")
        .size()
    )
    got_by_host = got.groupby("host").n_pages.sum()
    for host, n in want.items():
        assert got_by_host[host] == n
