"""Robots Crawl-delay enforcement: the stateless round-indexed token
bucket (operators/politeness.py ``crawl_delay_budgets``), per-host
budget overrides in the dequeue (uniform-k default untouched), and the
engine's delay-aware schedule — including WAIT rounds that must not
terminate the crawl. The reference has no delay concept (one sequential
browser), so the feature is opt-in via ``CrawlConfig.round_interval_ms``
and the default path stays byte-identical (covered by every existing
conformance test running with the default None)."""

import pandas as pd
import pytest

from text2mc_dataprocessor_spark.operators.frontier import (
    dequeue,
    dequeue_pruned,
    grouped_counts,
    stable_dequeue_group_expr,
)
from text2mc_dataprocessor_spark.operators.politeness import crawl_delay_budgets
from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
from text2mc_dataprocessor_spark.sources.fixtures import (
    generate_corpus,
    host_name,
    pages_to_spark,
    seeds_to_spark,
)


def _robots_df(spark, delays: dict[str, int]):
    pdf = pd.DataFrame(
        {
            "host": list(delays),
            "disallow_prefixes": [[] for _ in delays],
            "crawl_delay_ms": list(delays.values()),
        }
    )
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------- tokens


def test_token_bucket_matches_closed_form(spark):
    """Per-round grants equal floor((r+1)I/D) − floor(rI/D) capped at the
    politeness budget, so any R-round window sums to ~floor(R·I/D)."""
    interval, pb = 1000, 5
    delays = {"a": 300, "b": 1000, "c": 2500, "d": 7000}
    robots = _robots_df(spark, delays)
    grants: dict[str, list[int]] = {h: [] for h in delays}
    for r in range(10):
        rows = crawl_delay_budgets(robots, r, interval, pb).collect()
        got = {row.host: row.host_budget for row in rows}
        for h, d in delays.items():
            want = min(((r + 1) * interval) // d - (r * interval) // d, pb)
            assert got[h] == want, (h, r)
            grants[h].append(got[h])
    # slow host d (7×interval): exactly one fetch every ceil(D/I)=7 rounds
    assert sum(grants["d"]) == 1 and grants["d"][6] == 1
    # sub-interval host a: ~I/D per round, never above the cap
    assert sum(grants["a"]) == (10 * interval) // delays["a"]
    assert all(g <= pb for g in grants["a"])


def test_zero_and_absent_delays_emit_no_rows(spark):
    robots = _robots_df(spark, {"a": 0, "b": 500})
    out = crawl_delay_budgets(robots, 0, 1000, 3).collect()
    assert {r.host for r in out} == {"b"}


def test_interval_none_disables_and_nonpositive_raises(spark):
    """None (the documented opt-out, and what the error message
    recommends) must yield an empty budgets dimension — every host
    default-budget — not a TypeError; interval <= 0 raises (it would
    grant 0 tokens forever and livelock run(rounds=None))."""
    robots = _robots_df(spark, {"a": 500})
    disabled = crawl_delay_budgets(robots, 0, None, 3)
    assert disabled.columns == ["host", "host_budget"]
    assert disabled.count() == 0
    for bad in (0, -5):
        with pytest.raises(ValueError, match="round_interval_ms"):
            crawl_delay_budgets(robots, 0, bad, 3)


# --------------------------------------------------------------- dequeue


def _queue_df(spark, hosts: dict[str, int]):
    rows, seq = [], 0
    for h, n in hosts.items():
        for i in range(n):
            rows.append(
                (f"https://{h}/p{i}", h, seq, 0, "detail", 1, 1.0,
                 "QUEUED", seq, 0, None)
            )
            seq += 1
    pdf = pd.DataFrame(
        rows,
        columns=["url", "host", "url_hash", "bucket", "kind", "depth",
                 "score", "state", "discovered_seq", "round", "parent_url"],
    )
    return spark.createDataFrame(pdf)


def test_dequeue_per_host_budget_overrides(spark):
    q = _queue_df(spark, {"a": 5, "b": 5, "c": 5})
    hb = spark.createDataFrame(
        pd.DataFrame({"host": ["a", "b"], "host_budget": [2, 0]})
    )
    out = dequeue(q, politeness_budget=3, host_budgets=hb).toPandas()
    by_host = out.groupby("host").size().to_dict()
    # a capped at 2, b starved, c defaults to the uniform budget
    assert by_host == {"a": 2, "c": 3}
    # rank is dense 1..n and respects (score, depth, seq) order
    assert sorted(out.dequeue_rank) == list(range(1, len(out) + 1))
    assert list(out.sort_values("dequeue_rank").discovered_seq) == sorted(
        out.discovered_seq
    )
    # columns unchanged — host_budget never leaks downstream
    assert "host_budget" not in out.columns


def test_dequeue_pruned_equals_plain_with_host_budgets(spark):
    q = _queue_df(spark, {"a": 40, "b": 40, "c": 40})
    hb = spark.createDataFrame(
        pd.DataFrame({"host": ["a"], "host_budget": [1]})
    )
    counts = grouped_counts(q, stable_dequeue_group_expr())
    plain = dequeue(q, 8, global_budget=10, host_budgets=hb).toPandas()
    pruned = dequeue_pruned(q, 8, 10, counts, host_budgets=hb).toPandas()
    key = ["url", "dequeue_rank"]
    pd.testing.assert_frame_equal(
        plain[key].sort_values(key).reset_index(drop=True),
        pruned[key].sort_values(key).reset_index(drop=True),
    )


# ---------------------------------------------------------------- engine


def test_engine_delay_schedule_and_drain(spark, tmp_path):
    """Host 0 carries delay = 2×interval: it is fetched ≤1 URL per round,
    only in even rounds (token at 0-based odd indexes), and the crawl
    still drains to the full golden extracted table."""
    corpus = generate_corpus(
        n_hosts=2, listing_pages_per_host=1, links_per_listing=2, seed=11
    )
    h0, h1 = host_name(0), host_name(1)
    robots = _robots_df(spark, {h0: 2000, h1: 0})
    cfg = CrawlConfig(
        politeness_budget=4, n_buckets=8, round_interval_ms=1000,
        bloom_capacity_per_bucket=10_000,
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), pages_to_spark(spark, corpus),
        robots=robots, config=cfg,
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()

    trace = eng.trace_df().toPandas()
    t0 = trace[trace.host == h0]
    per_round = t0.groupby("round").size()
    assert len(t0) > 0
    assert (per_round <= 1).all()  # tokens cap the budget below pb=4
    assert all(r % 2 == 0 for r in per_round.index)  # even rounds only
    # the unthrottled host is untouched by h0's schedule: it runs at the
    # full uniform budget from round 1
    t1 = trace[trace.host == h1]
    assert 1 in set(t1["round"])
    # full drain: extracted matches the golden fixture byte-for-byte —
    # throttling delays the throttled host, it never starves it
    got = eng.extracted_df().toPandas().sort_values("url").reset_index(drop=True)
    want = corpus.golden.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_wait_rounds_do_not_terminate(spark, tmp_path):
    """Single host, delay 3×interval: round 1 grants 0 tokens (0-based
    index 0 → floor(1/3)=0), so the very first round is a WAIT round —
    the engine must keep going and fetch on the refill round."""
    corpus = generate_corpus(
        n_hosts=1, listing_pages_per_host=1, links_per_listing=2, seed=5
    )
    h0 = host_name(0)
    robots = _robots_df(spark, {h0: 3000})
    cfg = CrawlConfig(
        politeness_budget=2, n_buckets=8, round_interval_ms=1000,
        bloom_capacity_per_bucket=10_000,
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "ww"), pages_to_spark(spark, corpus),
        robots=robots, config=cfg,
    )
    eng.init(seeds_to_spark(spark, corpus))
    rounds = eng.run()
    trace = eng.trace_df().toPandas()
    assert len(trace) > 0
    # grants land only every 3rd round (0-based indexes 2, 5, 8, … →
    # 1-based rounds 3, 6, 9, …) and wait rounds were executed between.
    # Only h0 is throttled: the corpus's download links live on the
    # third-party mirror host, which has no delay row and fetches at
    # the full budget the round after discovery.
    fetch_rounds = sorted(set(trace[trace["host"] == h0]["round"]))
    assert fetch_rounds and all(r % 3 == 0 for r in fetch_rounds)
    other = trace[trace["host"] != h0]
    assert len(other) > 0 and any(r % 3 != 0 for r in other["round"])
    assert rounds >= max(fetch_rounds)
    # the whole (tiny) corpus still drains despite the throttle
    got = eng.extracted_df().toPandas().sort_values("url").reset_index(drop=True)
    want = corpus.golden.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_default_config_ignores_delay_column(spark, tmp_path):
    """round_interval_ms=None (default): the crawl_delay_ms column is
    inert — the trace equals the no-robots run on the same corpus."""
    corpus = generate_corpus(
        n_hosts=2, listing_pages_per_host=1, links_per_listing=2, seed=9
    )
    robots = _robots_df(spark, {host_name(0): 5000, host_name(1): 5000})
    traces = []
    for name, rb in (("plain", None), ("robots", robots)):
        cfg = CrawlConfig(politeness_budget=3, n_buckets=8,
                          bloom_capacity_per_bucket=10_000)
        eng = CrawlEngine(
            spark, str(tmp_path / name), pages_to_spark(spark, corpus),
            robots=rb, config=cfg,
        )
        eng.init(seeds_to_spark(spark, corpus))
        eng.run()
        pdf = eng.trace_df().toPandas().sort_values("dequeue_seq")
        traces.append(list(pdf.url))
    assert traces[0] == traces[1]


def test_nonpositive_interval_rejected(spark):
    """ADVICE r4: interval<=0 grants 0 tokens forever → run(rounds=None)
    livelock; both the config and the operator must reject it (None is
    the documented disable value)."""
    for bad in (0, -5):
        with pytest.raises(ValueError, match="round_interval_ms"):
            CrawlConfig(round_interval_ms=bad)
        with pytest.raises(ValueError, match="round_interval_ms"):
            crawl_delay_budgets(
                _robots_df(spark, {"h0": 1000}), 0, bad, 4)
