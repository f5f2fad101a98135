"""Engine-level tests for round-2 additions:

- S6 HEAD probe: artifacts-backed download_size on extracted rows.
- download_url-keyed raw-link fill (reference re-fetches the download
  page per ROW — selenium_scraper.py:280-345 — so rows sharing a
  download_url all get the link, including detail rows extracted after
  the download page was fetched), checked against the pure-Python
  oracle AND a handcrafted shared-download corpus.
- cuckoo re-crawl: forget(url) → the next discovery re-enqueues and
  re-fetches it through the normal dedup path (delete → rediscover).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
from text2mc_dataprocessor_spark.plans.oracle import simulate_rounds
from text2mc_dataprocessor_spark.sources.fixtures import (
    Corpus,
    _detail_html,
    _internal_download_html,
    _listing_html,
    _pages_df,
    pages_to_spark,
    seeds_to_spark,
)


def _pages(page_rows):
    import random

    return _pages_df(page_rows, random.Random(0), 0.0)


def _shared_download_corpus() -> Corpus:
    """Two listings on one host; details D1+D2 (listing 0) and D3
    (listing 1) all point at the SAME download page."""
    h = "h0.planetminecraft.com"
    dl_rel = "/project/shared/download/"
    dl_abs = f"https://{h}{dl_rel}"
    s3_path = "/files/resource_media/schematic/shared.zip"
    raw = f"https://static.planetminecraft.com{s3_path}"

    page_rows, graph, golden = [], [], []
    l0, l1 = f"https://{h}/projects/?p=0", f"https://{h}/projects/?p=1"
    page_rows.append((l0, _listing_html(["/project/d1/", "/project/d2/"], "/projects/?p=1", False)))
    graph += [(l0, 0, f"https://{h}/project/d1/", "detail"),
              (l0, 1, f"https://{h}/project/d2/", "detail"),
              (l0, 2, l1, "listing")]
    page_rows.append((l1, _listing_html(["/project/d3/"], None, False)))
    graph += [(l1, 0, f"https://{h}/project/d3/", "detail")]
    for d in ("d1", "d2", "d3"):
        durl = f"https://{h}/project/{d}/"
        page_rows.append((durl, _detail_html(["Castle"], None, dl_rel, None)))
        graph.append((durl, 0, dl_abs, "download"))
        golden.append(dict(url=durl, download_url=dl_abs, image_url="",
                           tags=str(["Castle"]), raw_download_link=raw))
    page_rows.append((dl_abs, _internal_download_html("plain", s3_path)))

    return Corpus(
        pages=_pages(page_rows),
        seeds=pd.DataFrame([(l0, 0)], columns=["url", "seed_rank"]),
        golden=pd.DataFrame(golden),
        robots=pd.DataFrame({"host": [h], "disallow_prefixes": [[]], "crawl_delay_ms": [0]}),
        graph=pd.DataFrame(graph, columns=["page_url", "dom_pos", "href", "kind"]),
    )


def test_shared_download_url_fills_every_row(spark, tmp_path):
    """All rows sharing a download_url get the raw link — including D3,
    whose download candidate is seen-deduped (the page was already
    fetched when D3 is extracted)."""
    corpus = _shared_download_corpus()
    eng = CrawlEngine(
        spark, str(tmp_path / "w"), pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=1, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()
    got = {r.url: r.raw_download_link for r in eng.extracted_df().collect()}
    want = {g["url"]: g["raw_download_link"] for g in corpus.golden.to_dict("records")}
    assert got == want
    # and the pure-Python oracle agrees row-for-row
    oracle = simulate_rounds(corpus, politeness_budget=1)
    assert {u: rec["raw_download_link"] for u, rec in oracle.extracted.items()} == want


def test_head_probe_fills_download_size(spark, corpus, tmp_path):
    """S6: with an artifacts table, every extracted row with a raw link
    carries download_size == the artifact's byte length; rows without a
    raw link (or with a missing artifact) stay NULL."""
    raws = sorted({r for r in corpus.golden["raw_download_link"] if r})
    bodies = {u: b"x" * (100 + sum(u.encode()) % 400) for u in raws}
    missing = raws[0]  # simulate a dead artifact url
    artifacts = spark.createDataFrame(
        pd.DataFrame({"url": [u for u in raws if u != missing],
                      "html": [bodies[u] for u in raws if u != missing]}),
        schema="url string, html binary",
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "w"), pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=8, n_buckets=8),
        artifacts=artifacts,
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()
    rows = eng.extracted_df().collect()
    assert any(r.download_size is not None for r in rows)
    for r in rows:
        if r.raw_download_link and r.raw_download_link != missing:
            assert r.download_size == len(bodies[r.raw_download_link]), r.url
        else:
            assert r.download_size is None, r.url


def _recrawl_corpus():
    """One host, pagination chain L0 → L1 → L2. L0 anchors D1; L2
    anchors D1 AGAIN (listing churn re-surfacing an old project — the
    normal rediscovery vector). With politeness budget 2, D1 is fetched
    in round 2 (alongside L1) while L2 is still queued — forgetting D1
    between rounds lets L2's anchor rediscover it through the ordinary
    dedup path."""
    h = "h0.planetminecraft.com"
    d1 = f"https://{h}/project/d1/"
    ls = [f"https://{h}/projects/?p={k}" for k in range(3)]
    page_rows = [
        (ls[0], _listing_html(["/project/d1/"], "/projects/?p=1", False)),
        (ls[1], _listing_html([], "/projects/?p=2", False)),
        (ls[2], _listing_html(["/project/d1/"], None, False)),
        (d1, _detail_html(["Fantasy"], None, None, None)),
    ]
    seeds = pd.DataFrame([(ls[0], 0)], columns=["url", "seed_rank"])
    return _pages(page_rows), seeds, d1


def test_cuckoo_forget_rediscover(spark, tmp_path):
    """Delete → rediscover over the cuckoo seen set: after forget(D1),
    the next listing that anchors D1 re-enqueues it and the crawl
    fetches it a second time."""
    pages_pdf, seeds_pdf, d1 = _recrawl_corpus()
    pages = spark.createDataFrame(
        pages_pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "w"), pages,
        config=CrawlConfig(politeness_budget=2, n_buckets=8, seen_filter="cuckoo"),
    )
    eng.init(spark.createDataFrame(seeds_pdf, schema="url string, seed_rank int"))
    # r1: L0 (discovers D1, L1); r2: L1 + D1 (L2 discovered, still queued)
    eng.run(rounds=2)
    trace1 = [r.url for r in eng.trace_df().collect()]
    assert trace1.count(d1) == 1

    eng.forget(spark.createDataFrame([(d1,)], "url string"))
    eng.run()  # r3: L2 → rediscovers D1; r4: D1 re-fetched
    trace2 = [r.url for r in eng.trace_df().orderBy("dequeue_seq").collect()]
    assert trace2.count(d1) == 2, trace2
    seen = [r.url for r in eng.seen_df().collect()]
    assert seen.count(d1) == 1  # re-added exactly once

    # resume from the committed snapshot: re-crawl state survives
    eng2 = CrawlEngine.resume(
        spark, str(tmp_path / "w"), pages,
        config=CrawlConfig(politeness_budget=2, n_buckets=8, seen_filter="cuckoo"),
    )
    assert [r.url for r in eng2.trace_df().orderBy("dequeue_seq").collect()] == trace2


def test_forget_without_requeue_is_noop_for_bloom_backstop(spark, tmp_path):
    """Bloom variant: forget() still removes the url from the exact
    seen table (the backstop readmits it), so rediscovery works even
    without a deletable filter — just without pre-filter selectivity."""
    pages_pdf, seeds_pdf, d1 = _recrawl_corpus()
    pages = spark.createDataFrame(
        pages_pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "w"), pages,
        config=CrawlConfig(politeness_budget=2, n_buckets=8),
    )
    eng.init(spark.createDataFrame(seeds_pdf, schema="url string, seed_rank int"))
    eng.run(rounds=2)
    eng.forget(spark.createDataFrame([(d1,)], "url string"))
    eng.run()
    trace = [r.url for r in eng.trace_df().collect()]
    assert trace.count(d1) == 2
