"""Verification drive: exercise the engine's public surfaces from a
non-repo cwd, with probes (missing page, robots deny-all, resume,
empty seeds). Run manually: cd /tmp && python /root/repo/scripts/verify_drive.py
Expected: ends with VERIFY-DRIVE DONE and all probes as documented in
.claude/skills/verify/SKILL.md."""
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import pandas as pd  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from text2mc_dataprocessor_spark.session import get_spark  # noqa: E402

spark = get_spark("verify", cores=8, shuffle_partitions=8)

df = em.entry(spark)
print("entry rows:", df.count(), "schema:", df.columns)
for r in df.orderBy("url").limit(2).collect():
    print("  sample:", r.url, "|", r.extracted_text[:90].replace("\x1f", "<US>"))

from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine  # noqa: E402
from text2mc_dataprocessor_spark.sources.fixtures import (  # noqa: E402
    generate_corpus,
    pages_to_spark,
    seeds_to_spark,
)

corpus = generate_corpus(n_hosts=2, listing_pages_per_host=2, links_per_listing=4, seed=99)
wd = tempfile.mkdtemp(prefix="vfy_")
eng = CrawlEngine(spark, wd, pages_to_spark(spark, corpus), config=CrawlConfig(politeness_budget=5, n_buckets=8))
eng.init(seeds_to_spark(spark, corpus))
n = eng.run()
print("rounds:", n, "trace:", eng.trace_df().count(), "extracted:", eng.extracted_df().count(), "golden:", len(corpus.golden))
got = {r.url: r.extracted_text for r in eng.extracted_df().collect()}
want = dict(zip(corpus.golden.url, corpus.golden.extracted_text))
print("byte-identical extracted vs golden:", got == want)

bad_seeds = spark.createDataFrame(
    pd.DataFrame(
        {
            "url": ["https://h0.planetminecraft.com/projects/?p=0", "https://nowhere.example/missing"],
            "seed_rank": [0, 1],
        }
    ),
    schema="url string, seed_rank int",
)
wd2 = tempfile.mkdtemp(prefix="vfy2_")
e2 = CrawlEngine(spark, wd2, pages_to_spark(spark, corpus), config=CrawlConfig(politeness_budget=5, n_buckets=8))
e2.init(bad_seeds)
e2.run()
states = {r.url: r.state for r in e2.frontier_df().collect()}
print("PROBE missing page state:", states.get("https://nowhere.example/missing"))

robots = spark.createDataFrame(
    pd.DataFrame(
        {
            "host": ["h0.planetminecraft.com", "h1.planetminecraft.com"],
            "disallow_prefixes": [["/"], ["/"]],
            "crawl_delay_ms": [0, 0],
        }
    )
)
wd3 = tempfile.mkdtemp(prefix="vfy3_")
e3 = CrawlEngine(spark, wd3, pages_to_spark(spark, corpus), robots=robots, config=CrawlConfig(politeness_budget=5, n_buckets=8))
e3.init(seeds_to_spark(spark, corpus))
e3.run()
f3 = e3.frontier_df().groupBy("state").count().collect()
print("PROBE deny-all states:", {r.state: r["count"] for r in f3}, "trace:", e3.trace_df().count())

wd4 = tempfile.mkdtemp(prefix="vfy4_")
e4 = CrawlEngine(spark, wd4, pages_to_spark(spark, corpus), config=CrawlConfig(politeness_budget=5, n_buckets=8))
e4.init(seeds_to_spark(spark, corpus))
e4.run(rounds=1)
e5 = CrawlEngine.resume(spark, wd4, pages_to_spark(spark, corpus), config=CrawlConfig(politeness_budget=5, n_buckets=8))
e5.run()
got5 = {r.url: r.extracted_text for r in e5.extracted_df().collect()}
print("PROBE resume byte-identical:", got5 == want)

wd6 = tempfile.mkdtemp(prefix="vfy6_")
e6 = CrawlEngine(spark, wd6, pages_to_spark(spark, corpus), config=CrawlConfig())
e6.init(spark.createDataFrame([], "url string, seed_rank int"))
print("PROBE empty seeds rounds:", e6.run())
print("VERIFY-DRIVE DONE")
