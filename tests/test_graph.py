"""PageRank: closed-form cases (cycle → uniform, star → known masses),
numpy power-iteration parity on a random graph, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.graph import pagerank


def test_cycle_is_uniform(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, n_iter=20).collect()}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_star_known_masses(spark):
    # 1,2,3 → 0; one 20-iter run vs the closed recurrence
    e = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, n_iter=20).collect()}
    leaf = 0.15 / 4  # no in-edges: (1-d)/N every iteration
    center = 0.15 / 4 + 0.85 * 3 * leaf
    assert got[1] == pytest.approx(leaf, abs=1e-12)
    assert got[0] == pytest.approx(center, abs=1e-12)


def test_matches_numpy_power_iteration(spark):
    rng = np.random.default_rng(3)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (300, 2))
                    if a != b})
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, n_iter=8).collect()}

    nodes = sorted({v for t in edges for v in t})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    out = np.zeros(N)
    for a, _ in edges:
        out[idx[a]] += 1
    r = np.full(N, 1 / N)
    for _ in range(8):
        nxt = np.full(N, 0.15 / N)
        for a, b in edges:
            nxt[idx[b]] += 0.85 * r[idx[a]] / out[idx[a]]
        r = nxt
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-9), v


def test_deterministic(spark):
    e = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7],
        "src long, dst long",
    )
    a = sorted((r.node, round(r.rank, 12)) for r in pagerank(e, n_iter=5).collect())
    b = sorted((r.node, round(r.rank, 12)) for r in pagerank(e, n_iter=5).collect())
    assert a == b


def test_score_classes_integral_and_rank_ordered(spark):
    from text2mc_dataprocessor_spark.operators.graph import (
        pagerank_score_classes,
    )

    # star: 1,2,3 -> 0; center holds the most mass -> top class
    e = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src long, dst long")
    got = {r.node: r.score for r in pagerank_score_classes(e, n_classes=2).collect()}
    assert all(s == float(int(s)) for s in got.values())
    assert got[0] == 1.0 and set(got.values()) == {0.0, 1.0}


def test_score_classes_quantile_parity_and_plan(spark):
    """VERDICT r4 #5: the URL-level quantizer. On a graph with distinct
    ranks it matches ntile exactly (up to boundary ties — none here);
    its scoring plan has NO window and NO Exchange (bounds are driver
    literals over the checkpointed rank table)."""
    from text2mc_dataprocessor_spark.operators.graph import (
        pagerank_score_classes,
    )

    # path graph: rank strictly increases along the chain -> distinct
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    exact = {
        r.node: r.score
        for r in pagerank_score_classes(e, n_classes=4, n_iter=12).collect()
    }
    approx_df = pagerank_score_classes(
        e, n_classes=4, n_iter=12, method="quantile"
    )
    approx = {r.node: r.score for r in approx_df.collect()}
    assert approx == exact
    assert all(s == float(int(s)) for s in approx.values())
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Exchange" not in plan, plan

    with pytest.raises(ValueError, match="method"):
        pagerank_score_classes(e, method="median")


def test_rescore_with_quantile_score_classes(spark, tmp_path):
    """CrawlEngine.rescore consumes the quantile-quantized rank signal
    end-to-end: host-level pagerank over a synthetic link graph ->
    integral classes -> rescore accepts them and re-orders the queue."""
    from text2mc_dataprocessor_spark.operators.graph import (
        pagerank_score_classes,
    )
    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        generate_corpus,
        pages_to_spark,
        seeds_to_spark,
    )

    corpus = generate_corpus(
        n_hosts=2, listing_pages_per_host=1, links_per_listing=4, seed=7
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "q"), pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=8, global_budget=2, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run(rounds=1)

    hosts = sorted(
        r.host
        for r in eng._state["queue"].select("host").distinct().collect()
    )
    assert len(hosts) == 2
    # host graph where hosts[-1] is the sink of all mass -> top class
    edges = spark.createDataFrame(
        [(hosts[0], hosts[1])] + [(f"ext{i}.x", hosts[1]) for i in range(3)],
        "src string, dst string",
    )
    scores = pagerank_score_classes(
        edges, n_classes=2, n_iter=5, method="quantile"
    ).withColumnRenamed("node", "host")
    info = eng.rescore(scores.filter(F.col("host").isin(hosts)))
    assert info["rescored"] > 0
    eng.run(rounds=1)
    tr = eng.trace_df().toPandas()
    r2 = tr[tr["round"] == 2]
    assert len(r2) == 2 and set(r2.host) == {hosts[1]}


def test_rescore_reprioritizes_queue(spark, tmp_path):
    """An external score signal re-orders the frontier: boost one host's
    queued detail pages above everything and the next (pruned-regime)
    dequeue serves only that host — with the per-group counts rebuilt,
    not stale."""
    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        generate_corpus,
        pages_to_spark,
        seeds_to_spark,
    )

    corpus = generate_corpus(
        n_hosts=2, listing_pages_per_host=1, links_per_listing=4, seed=7
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "c"), pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=8, global_budget=2, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run(rounds=1)

    hosts = sorted(
        r.host
        for r in eng._state["queue"].select("host").distinct().collect()
    )
    target = hosts[-1]
    info = eng.rescore(
        spark.createDataFrame([(target, 3.0)], "host string, score double")
    )
    assert info["rescored"] > 0
    eng.run(rounds=1)
    tr = eng.trace_df().toPandas()
    r2 = tr[tr["round"] == 2]
    assert len(r2) == 2 and set(r2.host) == {target}


def test_rescore_rejects_fractional_scores(spark, tmp_path):
    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        generate_corpus,
        pages_to_spark,
        seeds_to_spark,
    )

    corpus = generate_corpus(
        n_hosts=2, listing_pages_per_host=1, links_per_listing=2, seed=9
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "f"), pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=4, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run(rounds=1)
    with pytest.raises(ValueError, match="integral"):
        eng.rescore(
            spark.createDataFrame([("h0.x", 2.5)], "host string, score double")
        )


def test_rescore_rejects_duplicate_keys(spark, tmp_path):
    """ADVICE r4: duplicate keys in the scores dim would fan out queue
    rows through the left join (double-fetched URLs committed as
    state) — rescore must raise, mirroring the integral-score check."""
    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        generate_corpus,
        pages_to_spark,
        seeds_to_spark,
    )

    corpus = generate_corpus(
        n_hosts=2, listing_pages_per_host=1, links_per_listing=2, seed=9
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "f"), pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=4, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run(rounds=1)
    n_before = eng.frontier_df().filter("state = 'queued'").count()
    with pytest.raises(ValueError, match="duplicate"):
        eng.rescore(spark.createDataFrame(
            [("h0.x", 3.0), ("h0.x", 4.0)], "host string, score double"))
    # queue untouched
    assert eng.frontier_df().filter("state = 'queued'").count() == n_before
