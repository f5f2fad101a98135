"""Pure-Python crawl-semantics oracles (test-only, no Spark).

Two independent simulators over the fixture corpus's *golden* outlink
graph (never the HTML — parsing correctness is tested separately):

1. ``reference_sequential_trace`` — the literal pass-ordered semantics
   of the reference scraper (/root/reference/scraper/run_scraper.py:6-22,
   selenium_scraper.py:139-345): one global fetch at a time; the whole
   listing-pagination chain first (FIFO append with exact-raw-string
   dedup, :165-175), then every detail row in frontier order (:211-218),
   then every download page in row order (:309-328). This is the
   reference's crawl ordering that the engine must reproduce under the
   same seed list + politeness budget (north rule).

2. ``simulate_rounds`` — the round-based generalization that IS the
   engine's documented contract: per round, dequeue the top-k QUEUED
   urls per host (k = politeness budget; optional global budget) by
   priority key ``(score DESC, depth ASC, discovered_seq ASC)``; fetch;
   enqueue outlinks in (parent dequeue order, DOM position) order with
   exact-match dedup; kind-scores listing=2.0 > detail=1.0 >
   download=0.0. With a single seed and global_budget=1 this reduces
   exactly to simulator 1 (asserted in tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse

import pandas as pd

KIND_SCORE = {"listing": 2.0, "detail": 1.0, "download": 0.0}


def url_host(url: str) -> str:
    return urlparse(url).netloc.lower()


@dataclass
class Entry:
    url: str
    kind: str
    depth: int
    score: float
    seq: int
    state: str = "QUEUED"  # QUEUED / FETCHED / FAILED / ROBOTS_DENIED
    parent_url: str | None = None


@dataclass
class CrawlResult:
    trace: list[dict] = field(default_factory=list)  # dequeue_seq, round, url, host, kind
    entries: dict[str, Entry] = field(default_factory=dict)
    extracted: dict[str, dict] = field(default_factory=dict)  # detail url → fields
    # accumulated download_url → raw link (reference semantics: the
    # reference re-fetches the download page for EVERY row, so every
    # row sharing a download_url carries the link — the engine fetches
    # once and joins this map; selenium_scraper.py:280-345)
    raw_links: dict[str, str] = field(default_factory=dict)

    @property
    def seen(self) -> set[str]:
        return set(self.entries)

    def trace_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            self.trace, columns=["dequeue_seq", "round", "url", "host", "kind"]
        )


class _GoldenGraph:
    """Outlink graph + extraction fields from the fixture corpus."""

    def __init__(self, corpus):
        self.outlinks: dict[str, list[tuple[int, str, str]]] = {}
        for r in corpus.graph.itertuples(index=False):
            self.outlinks.setdefault(r.page_url, []).append((r.dom_pos, r.href, r.kind))
        for v in self.outlinks.values():
            v.sort()
        self.fields = {
            r.url: dict(
                download_url=r.download_url,
                image_url=r.image_url,
                tags=r.tags,
                raw_download_link=r.raw_download_link,
            )
            for r in corpus.golden.itertuples(index=False)
        }
        self.page_urls = set(corpus.pages["url"])


def _priority_key(e: Entry):
    return (-e.score, e.depth, e.seq)


def _fetch_and_extract(g: _GoldenGraph, e: Entry, res: CrawlResult, next_seq: int) -> int:
    """Process one dequeued entry; returns updated next_seq."""
    if e.url not in g.page_urls:
        e.state = "FAILED"
        return next_seq
    e.state = "FETCHED"
    if e.kind in ("listing", "detail"):
        if e.kind == "detail":
            f = g.fields[e.url]
            res.extracted[e.url] = dict(
                url=e.url,
                download_url=f["download_url"],
                image_url=f["image_url"],
                tags=f["tags"],
                # filled when the download page is fetched; if another
                # parent's copy of the same download page was already
                # fetched, the link is known immediately
                raw_download_link=res.raw_links.get(f["download_url"], ""),
            )
        for _pos, href, kind in g.outlinks.get(e.url, []):
            if href in res.entries:  # exact raw-string dedup (F1)
                continue
            res.entries[href] = Entry(
                url=href,
                kind=kind,
                depth=e.depth + 1,
                score=KIND_SCORE[kind],
                seq=next_seq,
                parent_url=e.url,
            )
            next_seq += 1
    elif e.kind == "download":
        # the raw link is a property of the download PAGE; every
        # extracted row whose download_url is this page gets it
        parent = e.parent_url
        raw = g.fields[parent]["raw_download_link"] if parent in g.fields else ""
        res.raw_links[e.url] = raw
        for rec in res.extracted.values():
            if rec["download_url"] == e.url:
                rec["raw_download_link"] = raw
    return next_seq


def _init(corpus) -> tuple[_GoldenGraph, CrawlResult, int]:
    g = _GoldenGraph(corpus)
    res = CrawlResult()
    next_seq = 0
    for r in corpus.seeds.sort_values("seed_rank").itertuples(index=False):
        res.entries[r.url] = Entry(
            url=r.url, kind="listing", depth=0, score=KIND_SCORE["listing"], seq=next_seq
        )
        next_seq += 1
    return g, res, next_seq


def simulate_rounds(
    corpus,
    politeness_budget: int = 1,
    global_budget: int | None = None,
    max_rounds: int | None = None,
    disallow: dict[str, list[str]] | None = None,
) -> CrawlResult:
    g, res, next_seq = _init(corpus)
    dequeue_seq = 0
    rnd = 0
    while max_rounds is None or rnd < max_rounds:
        rnd += 1
        queued = [e for e in res.entries.values() if e.state == "QUEUED"]
        if disallow:
            for e in queued:
                prefixes = disallow.get(url_host(e.url), [])
                path = urlparse(e.url).path
                if any(path.startswith(p) for p in prefixes):
                    e.state = "ROBOTS_DENIED"
            queued = [e for e in queued if e.state == "QUEUED"]
        if not queued:
            break
        by_host: dict[str, list[Entry]] = {}
        for e in queued:
            by_host.setdefault(url_host(e.url), []).append(e)
        picked: list[Entry] = []
        for host_entries in by_host.values():
            host_entries.sort(key=_priority_key)
            picked.extend(host_entries[:politeness_budget])
        picked.sort(key=_priority_key)
        if global_budget is not None:
            picked = picked[:global_budget]
        for e in picked:
            res.trace.append(
                dict(
                    dequeue_seq=dequeue_seq,
                    round=rnd,
                    url=e.url,
                    host=url_host(e.url),
                    kind=e.kind,
                )
            )
            dequeue_seq += 1
            next_seq = _fetch_and_extract(g, e, res, next_seq)
    return res


def reference_sequential_trace(corpus) -> CrawlResult:
    """Literal reference pass ordering (single global fetch slot).

    Pass 1 (selenium_scraper.py:139-189): follow each seed's pagination
    chain to exhaustion, appending new detail urls FIFO. Pass 2
    (:193-276): every frontier row in order → detail extraction. Pass 3
    (:280-345): every row with a download_url in order → raw link.
    """
    g = _GoldenGraph(corpus)
    res = CrawlResult()
    dequeue_seq = 0

    def record(url: str, kind: str) -> None:
        nonlocal dequeue_seq
        res.trace.append(
            dict(
                dequeue_seq=dequeue_seq,
                round=dequeue_seq + 1,
                url=url,
                host=url_host(url),
                kind=kind,
            )
        )
        dequeue_seq += 1

    detail_rows: list[str] = []  # the projects_df PAGE_URL column, in order
    next_seq = 0

    # pass 1 — listing chains
    for r in corpus.seeds.sort_values("seed_rank").itertuples(index=False):
        current: str | None = r.url
        depth = 0
        while current is not None:
            res.entries.setdefault(
                current,
                Entry(current, "listing", depth, KIND_SCORE["listing"], next_seq),
            )
            next_seq += 1
            res.entries[current].state = "FETCHED"
            record(current, "listing")
            nxt = None
            for _pos, href, kind in g.outlinks.get(current, []):
                if kind == "detail":
                    if href not in res.entries:
                        res.entries[href] = Entry(
                            href, "detail", depth + 1, KIND_SCORE["detail"], next_seq,
                            parent_url=current,
                        )
                        next_seq += 1
                        detail_rows.append(href)
                elif kind == "listing":
                    nxt = href
            if nxt is not None and nxt in res.entries:
                nxt = None  # already crawled (cycle guard; reference would loop)
            current = nxt
            depth += 1

    # pass 2 — detail rows in frontier order
    for url in detail_rows:
        e = res.entries[url]
        if url not in g.page_urls:
            e.state = "FAILED"
            record(url, "detail")
            continue
        e.state = "FETCHED"
        record(url, "detail")
        f = g.fields[url]
        res.extracted[url] = dict(
            url=url,
            download_url=f["download_url"],
            image_url=f["image_url"],
            tags=f["tags"],
            raw_download_link="",
        )

    # pass 3 — download pages in row order
    for url in detail_rows:
        rec = res.extracted.get(url)
        if not rec or not rec["download_url"]:
            continue
        dl = rec["download_url"]
        if dl not in res.entries:
            res.entries[dl] = Entry(
                dl, "download", res.entries[url].depth + 1, KIND_SCORE["download"],
                next_seq, parent_url=url,
            )
            next_seq += 1
        e = res.entries[dl]
        if e.state != "QUEUED":
            continue  # shared download page already fetched
        if dl not in g.page_urls:
            e.state = "FAILED"
            record(dl, "download")
            continue
        e.state = "FETCHED"
        record(dl, "download")
        rec["raw_download_link"] = g.fields[url]["raw_download_link"]
    return res
