#!/usr/bin/env python
"""Micro-benchmark of the crawl round's bookkeeping ops on local-cluster.

Times each state operation in isolation at a given executor count so we
can see which parts of the per-round floor are data work (scales),
latency (fixed), or shared-resource bound (anti-scales).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.frontier import with_global_rank
from text2mc_dataprocessor_spark.operators.seen import PartitionedBloom
from text2mc_dataprocessor_spark.session import get_spark

E = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
cores = E * 2
spark = get_spark(f"exp-ops-{E}", executors=E, executor_cores=2,
                  executor_mem_mb=8192, shuffle_partitions=cores * 2,
                  extra_conf={"spark.locality.wait": "0s"})

d = F.col("id")
host = F.when(d % 8 == 0, F.lit(0)).otherwise(F.pmod(d, F.lit(1024))).cast("string")
url = F.concat(F.lit("https://h"), host, F.lit(".x.com/p/b"), d.cast("string"), F.lit("/"))
df = spark.range(0, N, 1, cores * 2).select(
    url.alias("url"),
    F.concat(F.lit("h"), host).alias("host"),
    F.xxhash64(url).alias("url_hash"),
    F.pmod(F.xxhash64(url), F.lit(64)).cast("int").alias("bucket"),
    F.lit(1.0).alias("score"), F.lit(0).alias("depth"),
    d.alias("discovered_seq"),
).cache()
df.count()

seen = df.select("url", "url_hash", "bucket").cache()
seen.count()


def t(name, fn):
    t0 = time.time()
    fn()
    print(f"{name:35s} {time.time()-t0:7.2f}s", flush=True)


# warm one trivial job
t("warm count(cached)", lambda: df.count())
t("count(cached) again", lambda: df.count())

w = Window.partitionBy("host").orderBy(F.col("score").desc(), F.col("depth").asc(), F.col("discovered_seq").asc())
t("host window+filter+count", lambda: df.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= N // 16).count())

info = {}
t("with_global_rank(persist+collect)", lambda: with_global_rank(
    df, [F.col("score").desc(), F.col("depth").asc(), F.col("discovered_seq").asc()],
    info=info, persist_input=True))
ranked = with_global_rank(df, [F.col("discovered_seq").asc()], out="rk")
t("consume ranked (count)", lambda: ranked.count())

half = df.filter(d_expr := (F.col("discovered_seq") % 2 == 0))
t("left_anti join (1M vs 0.5M)+count", lambda: df.join(half.select("url"), "url", "left_anti").count())

bloom = PartitionedBloom(64, max(100_000, N // 16))
bdf = bloom.build(seen.select("bucket", "url_hash")).cache()
t("bloom build+cache", lambda: bdf.count())
t("bloom probe cogroup+count", lambda: PartitionedBloom.probe(seen, bdf).count())
t("bloom merge cogroup+count", lambda: bloom.merge(bdf, seen.select("bucket", "url_hash")).count())

t("groupBy url min-struct (dedup)", lambda: df.groupBy("url").agg(F.min(F.struct("discovered_seq"))).count())

t("localCheckpoint 1M narrow", lambda: df.localCheckpoint(eager=True))
tmp = tempfile.mkdtemp(prefix="expops_")
t("parquet write 1M narrow", lambda: df.write.mode("overwrite").parquet(tmp + "/t1"))

# pure job-latency: 20 trivial jobs on a tiny cached df
tiny = spark.range(100).cache(); tiny.count()
t0 = time.time()
for _ in range(20):
    tiny.count()
print(f"{'20 trivial jobs':35s} {time.time()-t0:7.2f}s  ({(time.time()-t0)/20*1000:.0f} ms/job)")

spark.stop()
