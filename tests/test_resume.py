"""Checkpoint/resume property: stopping after any snapshot and resuming
yields byte-identical final state (north rule: resumable from any
snapshot). Mirrors the reference's NULL-cursor resume semantics
(/root/reference/scraper/selenium_scraper.py:196-209, 286-307) but via
versioned snapshots instead of column scans."""

import pandas as pd

from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
from text2mc_dataprocessor_spark.sources.fixtures import pages_to_spark, seeds_to_spark


def _final_state(eng):
    frontier = (
        eng.frontier_df().toPandas().sort_values("url").reset_index(drop=True)
    )
    trace = eng.trace_df().toPandas().sort_values("dequeue_seq").reset_index(drop=True)
    extracted = (
        eng.extracted_df().toPandas().sort_values("url").reset_index(drop=True)
    )
    seen = sorted(r.url for r in eng.seen_df().select("url").collect())
    return frontier, trace, extracted, seen


def test_resume_equals_uninterrupted(spark, corpus, tmp_path):
    cfg = CrawlConfig(politeness_budget=3, n_buckets=8, bloom_capacity_per_bucket=10_000)
    pages = pages_to_spark(spark, corpus)
    seeds = seeds_to_spark(spark, corpus)

    # uninterrupted run
    a = CrawlEngine(spark, str(tmp_path / "a"), pages, config=cfg)
    a.init(seeds)
    a.run()

    # interrupted: 2 rounds, new engine instance resumes from latest snapshot
    b1 = CrawlEngine(spark, str(tmp_path / "b"), pages, config=cfg)
    b1.init(seeds)
    b1.run(rounds=2)
    del b1
    b2 = CrawlEngine.resume(spark, str(tmp_path / "b"), pages, config=cfg)
    b2.run()

    for got, want in zip(_final_state(b2), _final_state(a)):
        if isinstance(got, pd.DataFrame):
            pd.testing.assert_frame_equal(got, want)
        else:
            assert got == want


def test_resume_from_earlier_version_replays_identically(spark, corpus, tmp_path):
    cfg = CrawlConfig(politeness_budget=3, n_buckets=8, bloom_capacity_per_bucket=10_000)
    pages = pages_to_spark(spark, corpus)
    seeds = seeds_to_spark(spark, corpus)

    a = CrawlEngine(spark, str(tmp_path / "a"), pages, config=cfg)
    a.init(seeds)
    a.run()
    final_trace = a.trace_df().toPandas().sort_values("dequeue_seq").reset_index(drop=True)
    final_version = a.version

    # roll the SAME workdir back to version 2 (after round 1) and replay
    a2 = CrawlEngine.resume(spark, str(tmp_path / "a"), pages, config=cfg, version=2)
    assert a2.round_number() == 1
    a2.run()
    replay_trace = (
        a2.trace_df().toPandas().sort_values("dequeue_seq").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(replay_trace, final_trace)
    assert a2.version == final_version


def test_checkpoint_cadence_equivalent(spark, corpus, tmp_path):
    """checkpoint_every=3 (reference's every-K-pages cadence) produces the
    same final state as per-round commits, and resume restarts from the
    last committed snapshot."""
    pages = pages_to_spark(spark, corpus)
    seeds = seeds_to_spark(spark, corpus)
    a = CrawlEngine(
        spark, str(tmp_path / "a"), pages,
        config=CrawlConfig(politeness_budget=3, n_buckets=8),
    )
    a.init(seeds)
    a.run()

    b = CrawlEngine(
        spark, str(tmp_path / "b"), pages,
        config=CrawlConfig(politeness_budget=3, n_buckets=8, checkpoint_every=3),
    )
    b.init(seeds)
    b.run(rounds=4)  # commits at round 3, round 4 left dirty → final commit
    b2 = CrawlEngine.resume(
        spark, str(tmp_path / "b"), pages,
        config=CrawlConfig(politeness_budget=3, n_buckets=8, checkpoint_every=3),
    )
    b2.run()
    for got, want in zip(_final_state(b2), _final_state(a)):
        if isinstance(got, pd.DataFrame):
            pd.testing.assert_frame_equal(got, want)
        else:
            assert got == want


def test_lineage_metrics_recorded(spark, corpus, tmp_path):
    cfg = CrawlConfig(politeness_budget=3, n_buckets=8)
    eng = CrawlEngine(spark, str(tmp_path / "m"), pages_to_spark(spark, corpus), config=cfg)
    eng.init(seeds_to_spark(spark, corpus))
    eng.run(rounds=3)
    lineage = eng.lineage_df().toPandas()
    for metric in ["dequeued", "fetched", "new_urls", "dup_dropped_seen"]:
        assert metric in set(lineage.metric), metric
    # per-partition fetch metrics exist
    assert (lineage.metric == "fetch_partition_rows").any()
    # trace dequeue counts match lineage
    total_deq = lineage[(lineage.metric == "dequeued") & (lineage.key == "total")].value.sum()
    assert total_deq == eng.trace_df().count()

def test_resume_hydrates_cursors_from_meta_without_history_scan(spark, corpus, tmp_path):
    """Resume cursors (max_seq, trace_count) ride in the manifest meta:
    hydrating state must run NO full-history Spark action. The probe
    monkeypatches the fallback actions (DataFrame.count / .agg / .first)
    to raise during resume — meta-backed hydration never calls them."""
    from pyspark.sql import DataFrame

    cfg = CrawlConfig(politeness_budget=3, n_buckets=8)
    a = CrawlEngine(spark, str(tmp_path / "m"), pages_to_spark(spark, corpus), config=cfg)
    a.init(seeds_to_spark(spark, corpus))
    a.run(rounds=2)
    want_seq, want_trace = a._max_seq, a._trace_count
    meta = a.t_frontier.manifest()["meta"]
    assert meta["max_seq"] == want_seq and meta["trace_count"] == want_trace

    def boom(self, *args, **kwargs):
        raise AssertionError("resume ran a full-history Spark action")

    saved = {n: getattr(DataFrame, n) for n in ("count", "agg", "first", "collect")}
    try:
        for n in saved:
            setattr(DataFrame, n, boom)
        b = CrawlEngine.resume(
            spark, str(tmp_path / "m"), pages_to_spark(spark, corpus), config=cfg
        )
    finally:
        for n, f in saved.items():
            setattr(DataFrame, n, f)
    assert b._max_seq == want_seq and b._trace_count == want_trace
    b.run()  # and the resumed crawl still completes
