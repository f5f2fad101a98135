"""Politeness bootstrap (plans/bootstrap.py) — robots.txt + sitemap.xml
fetched LIVE over a loopback http.server and fed into a crawl round:

- round 0 (bootstrap): GET /robots.txt + /sitemap.xml through the same
  HttpFetcher the crawl uses; parse into the robots_gate dimension and
  sitemap-discovered seeds (sitemapindex followed one level);
- rounds 1..n: the engine's dequeue obeys the crawled rules — the
  disallowed detail page is ROBOTS_DENIED and never fetched, while the
  sitemap-only page (linked from NO listing) is crawled.

Plus fetcher-agnostic unit coverage via TableFetcher: empty-rule
hosts dropped from the dimension, failed robots → allow-all,
sitemapindex cycle safety under max_sitemap_depth.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.plans.bootstrap import (
    bootstrap_politeness,
    seed_origins,
)
from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
from text2mc_dataprocessor_spark.sources.fetch import HttpFetcher, TableFetcher
from text2mc_dataprocessor_spark.sources.fixtures import generate_corpus

ROBOTS = (
    "User-agent: *\n"
    "Disallow: /project/b0-1/\n"
    "Crawl-delay: 2\n"
)
SITEMAP_INDEX = (
    '<?xml version="1.0"?><sitemapindex>'
    "<sitemap><loc>{base}/sitemap-pages.xml</loc></sitemap>"
    "</sitemapindex>"
)
SITEMAP_PAGES = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>{base}/extra/</loc><lastmod>2026-01-01</lastmod></url>"
    "</urlset>"
)
EXTRA_BODY = b"<html><body><p>standalone page, linked only from the sitemap</p></body></html>"


class _SiteHandler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        self.server.hits.append(self.path)
        body = self.server.site.get(self.path)
        if callable(body):
            body = body(f"http://127.0.0.1:{self.server.server_address[1]}")
        if body is None:
            self.send_error(404, "nope")
            return
        if isinstance(body, str):
            body = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def site_server():
    """One-host fixture corpus served over loopback HTTP: the
    generate_corpus pages re-rooted onto 127.0.0.1 (all intra-host
    links are relative, so the HTML needs no rewriting), plus
    robots.txt and a two-level sitemap chain."""
    corpus = generate_corpus(
        n_hosts=1, listing_pages_per_host=1, links_per_listing=4, seed=7
    )
    paths = {}
    for r in corpus.pages.itertuples(index=False):
        # url = https://h0.planetminecraft.com/<path> → serve at <path>
        paths["/" + r.url.split("/", 3)[3]] = bytes(r.html)
    paths["/robots.txt"] = ROBOTS
    paths["/sitemap.xml"] = lambda base: SITEMAP_INDEX.format(base=base)
    paths["/sitemap-pages.xml"] = lambda base: SITEMAP_PAGES.format(base=base)
    paths["/extra/"] = EXTRA_BODY

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    srv.site = paths
    srv.hits = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def site(site_server):
    return f"http://127.0.0.1:{site_server.server_address[1]}"


def test_bootstrap_fetches_and_parses_live_rules(spark, site):
    seeds = spark.createDataFrame([(f"{site}/projects/?p=0",)], "url string")
    robots, extra = bootstrap_politeness(
        seeds, HttpFetcher(timeout_s=10.0), user_agent="text2mc"
    )
    rules = robots.collect()
    assert len(rules) == 1
    assert rules[0].host == "127.0.0.1"
    assert list(rules[0].disallow_prefixes) == ["/project/b0-1/"]
    assert rules[0].crawl_delay_ms == 2000
    # the sitemapindex was followed to the child urlset
    assert [r.url for r in extra.collect()] == [f"{site}/extra/"]


def test_crawl_round_obeys_live_crawled_rules(spark, site, tmp_path):
    """End-to-end: bootstrap over HTTP, then a crawl whose fetch stage
    is the same HttpFetcher — round 2's dequeue must honor the robots
    rules fetched in round 0, and the frontier must include the
    sitemap-discovered seed."""
    fetcher = HttpFetcher(timeout_s=10.0)
    seeds = spark.createDataFrame([(f"{site}/projects/?p=0",)], "url string")
    robots, extra = bootstrap_politeness(seeds, fetcher)

    all_seeds = (
        seeds.union(extra)
        .select("url", (F.row_number().over(Window.orderBy("url")) - 1)
                .alias("seed_rank"))
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "crawl"), pages=None, robots=robots,
        config=CrawlConfig(politeness_budget=8, n_buckets=8),
        fetch_fn=fetcher.as_fetch_fn(),
    )
    eng.init(all_seeds)
    eng.run()

    trace = {r.url for r in eng.trace_df().collect()}
    # sitemap-only page (no listing links to it) was crawled
    assert f"{site}/extra/" in trace
    # disallowed detail page never fetched; its siblings were
    assert f"{site}/project/b0-1/" not in trace
    for slug in ("b0-0", "b0-2", "b0-3"):
        assert f"{site}/project/{slug}/" in trace

    states = {
        r.url: r.state
        for r in eng.frontier_df().select("url", "state").collect()
    }
    assert states[f"{site}/project/b0-1/"] == "ROBOTS_DENIED"
    assert states[f"{site}/extra/"] == "FETCHED"

    # extraction ran over the HTTP-fetched bodies: every allowed detail
    # page yielded an extracted row, the denied one none
    ext = {r.url for r in eng.extracted_df().select("url").collect()}
    assert {f"{site}/project/{s}/" for s in ("b0-0", "b0-2", "b0-3")} <= ext
    assert f"{site}/project/b0-1/" not in ext


def test_seed_origins_keeps_port_strips_it_from_host(spark):
    seeds = spark.createDataFrame(
        [("http://Example.COM:8080/a/b?q=1",), ("http://example.com:8080/c",),
         ("https://other.net/",), ("not a url",)],
        "url string",
    )
    rows = {r.origin: r.host for r in seed_origins(seeds).collect()}
    assert rows == {
        "http://example.com:8080": "example.com",
        "https://other.net": "other.net",
    }


def _replay(spark, rows):
    return TableFetcher(
        spark.createDataFrame(rows, "url string, html binary")
    )


def test_bootstrap_replay_allow_all_and_failures(spark):
    """Hosts with an empty-rule robots.txt or a failed fetch emit NO
    rules row (allow-all); sitemap misses yield no seeds."""
    seeds = spark.createDataFrame(
        [("https://a.example/x",), ("https://b.example/y",)], "url string"
    )
    fetcher = _replay(spark, [
        ("https://a.example/robots.txt", b"User-agent: *\nDisallow:\n"),
        # b.example: no robots.txt, no sitemap at all
    ])
    robots, extra = bootstrap_politeness(seeds, fetcher)
    assert robots.count() == 0
    assert extra.count() == 0


def test_bootstrap_replay_sitemap_cycle_bounded(spark):
    """A sitemapindex cycle (A→B→A) terminates at max_sitemap_depth
    without re-fetching, and both levels' page entries are collected."""
    a = "https://a.example/sitemap.xml"
    b = "https://a.example/sitemap-b.xml"
    idx = ('<sitemapindex><sitemap><loc>{child}</loc></sitemap>'
           "</sitemapindex>"
           "<urlset><url><loc>{page}</loc></url></urlset>")
    fetcher = _replay(spark, [
        (a, idx.format(child=b, page="https://a.example/p1").encode()),
        (b, idx.format(child=a, page="https://a.example/p2").encode()),
    ])
    seeds = spark.createDataFrame([("https://a.example/",)], "url string")
    robots, extra = bootstrap_politeness(
        seeds, fetcher, max_sitemap_depth=4
    )
    assert sorted(r.url for r in extra.collect()) == [
        "https://a.example/p1", "https://a.example/p2",
    ]


def test_bootstrap_merges_multi_origin_hosts(spark):
    """One host probed through several origins (http+https) must yield
    exactly ONE rules row — union of prefixes, max crawl-delay — or the
    duplicate host key would fan out every queued row of that host
    through robots_gate's join."""
    seeds = spark.createDataFrame(
        [("http://dual.example/x",), ("https://dual.example/y",)],
        "url string",
    )
    fetcher = _replay(spark, [
        ("http://dual.example/robots.txt",
         b"User-agent: *\nDisallow: /http-only/\nCrawl-delay: 1\n"),
        ("https://dual.example/robots.txt",
         b"User-agent: *\nDisallow: /https-only/\nCrawl-delay: 3\n"),
    ])
    robots, _ = bootstrap_politeness(seeds, fetcher)
    rows = robots.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.host == "dual.example"
    assert sorted(r.disallow_prefixes) == ["/http-only/", "/https-only/"]
    assert r.crawl_delay_ms == 3000


def test_bootstrap_non_utf8_bodies_isolated(spark):
    """One host serving non-UTF-8 robots/sitemap bytes must not abort
    the bootstrap (r5 review: F.decode throws MALFORMED_CHARACTER_CODING
    under this repo's ANSI default). The garbage host degrades to
    allow-all / no seeds; every other host's rules survive."""
    seeds = spark.createDataFrame(
        [("https://good.example/x",), ("https://bin.example/y",)],
        "url string",
    )
    fetcher = _replay(spark, [
        ("https://good.example/robots.txt",
         b"User-agent: *\nDisallow: /private/\n"),
        ("https://bin.example/robots.txt", b"\xff\xfe\x00\x01GIF89a\xda"),
        ("https://bin.example/sitemap.xml", b"\xff\xfe<not xml\xda"),
    ])
    robots, extra = bootstrap_politeness(seeds, fetcher)
    rows = robots.collect()
    assert [r.host for r in rows] == ["good.example"]
    assert list(rows[0].disallow_prefixes) == ["/private/"]
    assert extra.count() == 0


def test_bootstrap_fetches_each_origin_once(spark, site, site_server):
    """The returned frames are materialized at bootstrap time: acting
    on them repeatedly (as robots_gate does every crawl round) must
    issue ZERO further HTTP requests (r5 review: unpersisted lazy
    frames re-ran the live GETs on every action — ~3x per sitemap
    level plus one robots sweep per round)."""
    seeds = spark.createDataFrame([(f"{site}/projects/?p=0",)], "url string")
    start = len(site_server.hits)  # earlier tests share the module server
    robots, extra = bootstrap_politeness(seeds, HttpFetcher(timeout_s=10.0))
    baseline = len(site_server.hits)
    for _ in range(2):  # repeated consumption, e.g. one join per round
        robots.collect()
        extra.collect()
    assert len(site_server.hits) == baseline
    # and the bootstrap itself probed each endpoint exactly once
    from collections import Counter
    probes = Counter(
        p for p in site_server.hits[start:baseline]
        if p in ("/robots.txt", "/sitemap.xml", "/sitemap-pages.xml"))
    assert set(probes.values()) == {1}
