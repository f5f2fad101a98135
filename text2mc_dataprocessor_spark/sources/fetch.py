"""Fetch stage implementations.

The crawl loop's fetch stage is an interface boundary (plans/crawl.py
uses ``TableFetcher`` semantics inline — a broadcast join against the
pages table). This module names both implementations so the swap point
is explicit:

- ``TableFetcher``  — replay mode (sandbox / WARC re-processing): html
  comes from an existing pages table. The dequeued batch is broadcast;
  the pages side is scanned, never shuffled.

- ``HttpFetcher``   — production mode: real HTTP GETs inside
  ``mapInPandas`` over the salted-host-partitioned dequeue batch. Each
  task serves a small set of hosts (politeness was enforced per-host
  upstream), applies the host's crawl delay *within* the task
  (sequential per host, parallel across tasks), streams bodies in
  chunks (the reference downloads in 1 KiB chunks,
  selenium_scraper.py:598), and isolates per-row errors
  (:176-178) — a failed GET yields html=NULL → state=FAILED.

``HttpFetcher`` is stdlib-only (``urllib``) and exercised end-to-end in
tests/test_fetch_http.py against a loopback ``http.server`` (chunked
bodies, oversized responses, 404s, HEAD Content-Length) — no external
network needed.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the three columns ``HttpFetcher.fetch`` APPENDS to its input
#: (all input columns pass through)
FETCH_APPENDED_SCHEMA = "html binary, fetch_ms long, error string"


def host_of(url) -> "F.Column":
    """scheme://HOST/... → host (empty string when the url has no scheme)."""
    return F.regexp_extract(url, r"^[A-Za-z][\w+.-]*://([^/]+)", 1)


def download_all_builds(df: DataFrame, fetcher,
                        link_col: str = "raw_download_link",
                        host_partitions: int = 64) -> DataFrame:
    """S7 — bulk download driver (reference ``download_all_builds()``,
    scraper/selenium_scraper.py:502-518: iterate rows, GET each
    RAW_DOWNLOAD_LINK).

    Spark form: filter rows with a resolved raw link (F3), dedup per
    link (the reference re-downloads duplicates; one GET per distinct
    artifact is strictly cheaper and byte-identical), hash-partition by
    host so each task owns whole hosts — per-host crawl delays then
    serialize *within* a task (HttpFetcher applies them) while tasks
    run in parallel across hosts — and fetch. Works with either fetcher;
    TableFetcher (replay) broadcasts the candidate list so the
    repartition is a no-op there.

    Returns the fetcher's output: url + html (+ fetch_ms/error for the
    HTTP path).
    """
    cand = (
        df.filter(F.col(link_col).isNotNull() & (F.col(link_col) != ""))
        .select(F.col(link_col).alias("url"))
        .distinct()
        .repartition(host_partitions, host_of(F.col("url")))
    )
    return fetcher.fetch(cand)


class TableFetcher:
    """Replay fetch: look up html in a pages table (broadcast join)."""

    def __init__(self, pages: DataFrame):
        self.pages = pages.select("url", "html")

    def fetch(self, dequeued: DataFrame) -> DataFrame:
        """→ dequeued columns + html (inner join; misses are FAILED
        upstream via anti-join, as in plans/crawl.py)."""
        return self.pages.join(F.broadcast(dequeued), "url")

    def head(self, candidates: DataFrame, url_col: str = "url") -> DataFrame:
        """S6 HEAD probe, replay form: metadata-only fetch — emit
        ``download_size`` (Content-Length) per candidate url WITHOUT
        transferring the body (reference:
        scraper/selenium_scraper.py:520-573, which HEAD-probes every
        RAW_DOWNLOAD_LINK into DOWNLOAD_SIZE). Here the size is
        ``length(html)`` from the artifacts table; the binary column
        never crosses to Python and never joins through — Catalyst
        prunes it to a length scan. Misses → NULL size (the reference
        leaves NaN on failed probes)."""
        sizes = self.pages.select(
            F.col("url").alias(url_col),
            F.length("html").cast("long").alias("download_size"),
        )
        return candidates.join(sizes, url_col, "left")


class HttpFetcher:
    """Production fetch: HTTP GET per dequeued URL inside mapInPandas.

    Expects the input already repartitioned by (host, salt) — see
    operators/politeness.salt_fetch_partitions — so per-host delays
    serialize within a task without stalling the stage.
    """

    def __init__(self, timeout_s: float = 30.0, chunk_size: int = 1024,
                 crawl_delay_ms: int = 0, max_bytes: int = 50_000_000):
        # 1 KiB chunks and the 50 MB cap mirror the reference
        # (selenium_scraper.py:598, preprocess.py:52)
        self.timeout_s = timeout_s
        self.chunk_size = chunk_size
        self.crawl_delay_ms = crawl_delay_ms
        self.max_bytes = max_bytes

    def fetch(self, dequeued: DataFrame) -> DataFrame:
        """→ input columns + ``html``/``fetch_ms``/``error``.

        All input columns PASS THROUGH the mapInPandas stage: page
        bodies are born inside the (already host-salted) fetch tasks
        with their frontier columns attached, so the engine's
        ``fetch_fn`` seam needs no post-fetch join — at scale a join
        there would shuffle the full html payload that salting
        deliberately kept in place."""
        from pyspark.sql import types as T

        timeout_s = self.timeout_s
        chunk_size = self.chunk_size
        delay_ms = self.crawl_delay_ms
        max_bytes = self.max_bytes

        src = dequeued.drop("html", "fetch_ms", "error")
        out_schema = T.StructType(
            list(src.schema.fields)
            + [
                T.StructField("html", T.BinaryType()),
                T.StructField("fetch_ms", T.LongType()),
                T.StructField("error", T.StringType()),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import urllib.error  # stdlib — no executor-side deps
            import urllib.request

            last_host_hit: dict[str, float] = {}
            for pdf in batches:
                rows = []
                for url in pdf["url"]:
                    host = url.split("/", 3)[2] if "://" in url else url
                    if delay_ms:
                        since = time.time() - last_host_hit.get(host, 0.0)
                        wait = delay_ms / 1000.0 - since
                        if wait > 0:
                            time.sleep(wait)
                    t0 = time.time()
                    try:
                        try:
                            resp = urllib.request.urlopen(url, timeout=timeout_s)
                        except urllib.error.HTTPError as e:
                            # Reference semantics: the status code is never
                            # checked (selenium_scraper.py:581-600), so a
                            # 4xx/5xx error-page body is content like any
                            # other. HTTPError IS the response object.
                            resp = e
                        with resp:
                            buf = bytearray()
                            # stream in chunks (the reference downloads in
                            # 1 KiB chunks, selenium_scraper.py:598) so the
                            # cap aborts without buffering the whole body
                            while True:
                                chunk = resp.read(chunk_size)
                                if not chunk:
                                    break
                                buf.extend(chunk)
                                if len(buf) > max_bytes:
                                    raise ValueError("max_bytes exceeded")
                        rows.append((bytes(buf), int((time.time() - t0) * 1000), None))
                    except Exception as e:  # X4 per-row isolation
                        rows.append((None, int((time.time() - t0) * 1000), str(e)[:200]))
                    last_host_hit[host] = time.time()
                htmls, mss, errs = (
                    zip(*rows) if rows else ((), (), ())
                )
                yield pdf.assign(
                    html=pd.Series(htmls, dtype=object),
                    fetch_ms=pd.Series(mss, dtype="int64"),
                    error=pd.Series(errs, dtype=object),
                )

        return src.mapInPandas(run, out_schema)

    def as_fetch_fn(self):
        """``CrawlEngine(fetch_fn=...)`` adapter: same passthrough
        fetch, with X4 error rows dropped (the engine derives FAILED
        state from its dequeued-vs-extracted anti-join) and the HTTP
        diagnostics columns removed to match the replay-join shape."""

        def fn(dequeued: DataFrame) -> DataFrame:
            return (
                self.fetch(dequeued)
                .filter(F.col("error").isNull())
                .drop("fetch_ms", "error")
            )

        return fn

    def head(self, candidates: DataFrame, url_col: str = "url") -> DataFrame:
        """S6 HEAD probe, production form: HTTP HEAD per url inside
        mapInPandas — Content-Length only, no body transfer
        (selenium_scraper.py:520-573). Per-row error isolation (X4):
        a failed probe yields download_size=NULL."""
        timeout_s = self.timeout_s

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import urllib.request  # stdlib — no executor-side deps

            class _HeadRedirect(urllib.request.HTTPRedirectHandler):
                """CPython's default redirect handler re-issues a redirected
                HEAD as GET (the new Request is built without the method).
                That breaks the probe contract — the body would start
                streaming and the hit would register as a download on
                redirecting hosts (mediafire-style links). Preserve HEAD
                across redirects like requests.head(allow_redirects=True)
                and the reference (selenium_scraper.py:557) do."""

                def redirect_request(self, req, fp, code, msg, headers, newurl):
                    new = super().redirect_request(req, fp, code, msg, headers, newurl)
                    if new is not None and req.get_method() == "HEAD":
                        new.method = "HEAD"
                    return new

            opener = urllib.request.build_opener(_HeadRedirect)
            for pdf in batches:
                sizes = []
                for u in pdf[url_col]:
                    try:
                        req = urllib.request.Request(u, method="HEAD")
                        with opener.open(req, timeout=timeout_s) as resp:
                            cl = resp.headers.get("Content-Length")
                        sizes.append(int(cl) if cl is not None else None)
                    except Exception:
                        sizes.append(None)
                out = pdf.copy()
                out["download_size"] = pd.array(sizes, dtype="Int64")
                yield out

        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
        ) + ", download_size long"
        return candidates.mapInPandas(run, out_schema)
