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


def test_stateful_host_budget_accumulates_across_batches(spark, corpus, tmp_path):
    """applyInPandasWithState: per-host totals must carry over between
    micro-batches via the state store (maxFilesPerTrigger=1 forces one
    batch per landed file)."""
    src = str(tmp_path / "landing2")
    pages = pages_to_spark(spark, corpus)
    # two identical file-drops -> every host is seen in two micro-batches
    pages.coalesce(1).write.mode("overwrite").parquet(src)
    pages.coalesce(1).write.mode("append").parquet(src)

    stream = S.read_pages_stream(spark, src, max_files_per_trigger=1)
    tracked = S.stateful_host_budget(stream, budget=10**9)
    name = S.run_available_now_update(tracked, str(tmp_path / "ckpt2"))
    out = spark.table(name).toPandas()

    per_host = pages.groupBy(
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host")
    ).count().toPandas().set_index("host")["count"]

    finals = out.groupby("host").fetched_total.max()
    for host, n in per_host.items():
        assert finals[host] == 2 * n, host
    # cross-batch statefulness: the second batch's running total must
    # exceed its own batch_rows (it includes the first batch's count)
    carried = out[out.fetched_total > out.batch_rows]
    assert not carried.empty


def test_stateful_budget_flag(spark, corpus, tmp_path):
    src = str(tmp_path / "landing3")
    pages_to_spark(spark, corpus).coalesce(1).write.mode("overwrite").parquet(src)
    stream = S.read_pages_stream(spark, src)
    tracked = S.stateful_host_budget(stream, budget=1)
    name = S.run_available_now_update(
        tracked, str(tmp_path / "ckpt3"), name="stream_budget_flag"
    )
    out = spark.table(name).toPandas()
    assert (out[out.fetched_total > 1].over_budget).all()
    assert (~out[out.fetched_total <= 1].over_budget).all()
