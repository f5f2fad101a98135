"""Partitioned Bloom filter: zero false negatives (the correctness
contract of the pre-filter), sane FPR, distributed probe + merge."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.seen import (
    PartitionedBloom,
    bloom_params,
    split_new_urls,
)


def _keyed(spark, urls, n_buckets):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return (
        df.withColumn("url_hash", F.xxhash64("url"))
        .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
    )


def test_bloom_no_false_negatives(spark):
    pb = PartitionedBloom(n_buckets=16, capacity_per_bucket=2000, fpr=0.01)
    inserted = [f"https://h{i % 7}.example/p/{i}" for i in range(10_000)]
    keyed = _keyed(spark, inserted, 16)
    bloom = pb.build(keyed).cache()
    probed = PartitionedBloom.probe(keyed, bloom)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # NO false negatives


def test_bloom_fpr_reasonable(spark):
    pb = PartitionedBloom(n_buckets=16, capacity_per_bucket=2000, fpr=0.01)
    inserted = [f"https://h/p/{i}" for i in range(20_000)]
    fresh = [f"https://other/q/{i}" for i in range(20_000)]
    bloom = pb.build(_keyed(spark, inserted, 16))
    probed = PartitionedBloom.probe(_keyed(spark, fresh, 16), bloom)
    fp = probed.filter(F.col("maybe_seen")).count()
    # capacity 2000/bucket ×16 = 32k budget for 20k keys → ≲1% FPR; allow 3×
    assert fp / 20_000 < 0.03, fp


def test_bloom_merge_incremental(spark):
    pb = PartitionedBloom(n_buckets=8, capacity_per_bucket=1000, fpr=0.01)
    first = [f"https://a/{i}" for i in range(1000)]
    second = [f"https://b/{i}" for i in range(1000)]
    bloom = pb.build(_keyed(spark, first, 8))
    merged = pb.merge(bloom, _keyed(spark, second, 8)).cache()
    probed = PartitionedBloom.probe(_keyed(spark, first + second, 8), merged)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    assert merged.count() == 8  # one bitmap per bucket, no duplicates


def test_split_new_urls_exact(spark):
    """End-to-end dedup: bloom pre-filter + exact anti-join backstop
    returns exactly the unseen urls."""
    pb = PartitionedBloom(n_buckets=8, capacity_per_bucket=500, fpr=0.05)
    seen_urls = [f"https://s/{i}" for i in range(3000)]
    new_urls = [f"https://n/{i}" for i in range(500)]
    seen = _keyed(spark, seen_urls, 8)
    bloom = pb.build(seen)
    candidates = _keyed(spark, seen_urls[::3] + new_urls, 8)
    out = split_new_urls(candidates, seen, bloom)
    got = {r.url for r in out.select("url").collect()}
    assert got == set(new_urls)


def test_bloom_params_sizing():
    n_bits, n_hashes = bloom_params(10**6, 0.01)
    assert 9_000_000 < n_bits < 10_500_000  # ~9.6 bits/key at 1% FPR
    assert n_hashes in (6, 7)
    # 10^10 keys at 1% → ~12 GB of bits; partitioned so one bucket of 4096
    # holds ~2.9 MB — fits comfortably in a task
    n_bits, _ = bloom_params(10**10 // 4096, 0.01)
    assert n_bits / 8 / 1024 / 1024 < 4
