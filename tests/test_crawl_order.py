"""Crawl-order + seen-set conformance (north rule).

The engine must reproduce the reference scraper's crawl ordering and
final URL-seen set under the same seed list + politeness budget:

1. single seed + global budget 1 → the engine's dequeue trace equals the
   literal pass-ordered reference simulation exactly;
2. multi-host + per-host budget k → equals the round-based oracle
   (the documented generalization), including the final seen set and
   byte-identical extracted records.
"""

import pandas as pd
import pytest

from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
from text2mc_dataprocessor_spark.plans.oracle import (
    reference_sequential_trace,
    simulate_rounds,
)
from text2mc_dataprocessor_spark.sources.fixtures import pages_to_spark, seeds_to_spark


def _run_engine(spark, corpus, tmpdir, budget, global_budget=None):
    cfg = CrawlConfig(
        politeness_budget=budget,
        global_budget=global_budget,
        n_buckets=8,
        bloom_capacity_per_bucket=10_000,
    )
    eng = CrawlEngine(spark, str(tmpdir), pages_to_spark(spark, corpus), config=cfg)
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()
    return eng


def _engine_trace_urls(eng) -> list[str]:
    pdf = eng.trace_df().toPandas().sort_values("dequeue_seq")
    return list(pdf.url)


def _oracle_trace_urls(res) -> list[str]:
    return [t["url"] for t in res.trace]


def test_sequential_reference_conformance(spark, corpus_single_seed, tmp_path):
    corpus = corpus_single_seed
    eng = _run_engine(spark, corpus, tmp_path / "w1", budget=10**6, global_budget=1)
    oracle = reference_sequential_trace(corpus)

    assert _engine_trace_urls(eng) == _oracle_trace_urls(oracle)

    engine_seen = {r.url for r in eng.seen_df().select("url").collect()}
    assert engine_seen == oracle.seen

    _assert_extracted_equal(eng, oracle)


@pytest.mark.parametrize("budget", [1, 3])
def test_round_based_politeness_conformance(spark, corpus, tmp_path, budget):
    eng = _run_engine(spark, corpus, tmp_path / f"w{budget}", budget=budget)
    oracle = simulate_rounds(corpus, politeness_budget=budget)

    assert _engine_trace_urls(eng) == _oracle_trace_urls(oracle)
    engine_seen = {r.url for r in eng.seen_df().select("url").collect()}
    assert engine_seen == oracle.seen
    _assert_extracted_equal(eng, oracle)


def test_extracted_matches_golden_after_full_crawl(spark, corpus, tmp_path):
    """At frontier exhaustion the extracted table == the golden fixture,
    byte-for-byte (every download page has been visited)."""
    eng = _run_engine(spark, corpus, tmp_path / "wg", budget=4)
    got = (
        eng.extracted_df().toPandas().sort_values("url").reset_index(drop=True)
    )
    want = corpus.golden.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_robots_gate(spark, corpus, tmp_path):
    """Disallowed prefixes are never fetched and end in ROBOTS_DENIED."""
    from text2mc_dataprocessor_spark.sources.fixtures import host_name

    h0 = host_name(0)
    robots_pdf = pd.DataFrame(
        {"host": [h0], "disallow_prefixes": [["/project/b0-0"]], "crawl_delay_ms": [0]}
    )
    robots = spark.createDataFrame(robots_pdf)
    cfg = CrawlConfig(politeness_budget=4, n_buckets=8)
    eng = CrawlEngine(
        spark, str(tmp_path / "wr"), pages_to_spark(spark, corpus), robots=robots, config=cfg
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()

    oracle = simulate_rounds(
        corpus, politeness_budget=4, disallow={h0: ["/project/b0-0"]}
    )
    assert _engine_trace_urls(eng) == _oracle_trace_urls(oracle)

    frontier = eng.frontier_df().toPandas()
    denied = set(frontier[frontier.state == "ROBOTS_DENIED"].url)
    assert denied and all(u.startswith(f"https://{h0}/project/b0-0") for u in denied)
    traced = set(frontier[frontier.state == "FETCHED"].url)
    assert not (denied & traced)


def _assert_extracted_equal(eng, oracle):
    got = eng.extracted_df().toPandas().sort_values("url").reset_index(drop=True)
    want = (
        pd.DataFrame(list(oracle.extracted.values()))
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in ["download_url", "image_url", "tags", "raw_download_link"]:
        pd.testing.assert_series_equal(got[col], want[col], check_names=False)
