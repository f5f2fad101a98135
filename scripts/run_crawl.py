#!/usr/bin/env python
"""spark-submit entry point for the crawl engine.

Usage (local example; on a cluster swap --master and resources):

    python scripts/make_pyfiles_zip.py /tmp/t2m.zip
    spark-submit --master 'local[8]' \
        --py-files /tmp/t2m.zip \
        scripts/run_crawl.py \
        --workdir /tmp/crawl_run \
        --pages /path/to/pages_parquet \
        --seeds /path/to/seeds_parquet \
        --budget 4 --rounds 3

``--pages`` / ``--seeds`` parquet schemas: pages(url, html[, ...]),
seeds(url, seed_rank). With ``--fixture N`` a deterministic synthetic
corpus of N hosts is used instead (no input files needed). Resume a
previous run with ``--resume``.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--pages")
    ap.add_argument("--seeds")
    ap.add_argument("--fixture", type=int, default=0, help="use a synthetic corpus of N hosts")
    ap.add_argument("--budget", type=int, default=1)
    ap.add_argument("--global-budget", type=int, default=None)
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--checkpoint-every", type=int, default=1)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("t2m-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(
        politeness_budget=args.budget,
        global_budget=args.global_budget,
        n_buckets=args.n_buckets,
        checkpoint_every=args.checkpoint_every,
    )

    if args.fixture:
        from text2mc_dataprocessor_spark.sources.fixtures import (
            generate_corpus,
            pages_to_spark,
            seeds_to_spark,
        )

        corpus = generate_corpus(n_hosts=args.fixture)
        pages = pages_to_spark(spark, corpus)
        seeds = seeds_to_spark(spark, corpus)
    else:
        if not args.pages or not args.seeds:
            print("need --pages and --seeds (or --fixture N)", file=sys.stderr)
            sys.exit(2)
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)

    if args.resume:
        eng = CrawlEngine.resume(spark, args.workdir, pages, config=cfg)
    else:
        eng = CrawlEngine(spark, args.workdir, pages, config=cfg)
        eng.init(seeds)
    n = eng.run(rounds=args.rounds)
    print(
        f"rounds={n} version={eng.version} trace={eng.trace_df().count()} "
        f"extracted={eng.extracted_df().count()} seen={eng.seen_df().count()}"
    )


if __name__ == "__main__":
    main()
