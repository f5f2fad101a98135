"""S5/S6 HTTP path exercised for real against a loopback http.server —
no external network. Covers: streamed GET bodies (multi-chunk), the
50 MB-cap abort (here shrunk), 404 → error-page body as content
(reference never checks status_code, selenium_scraper.py:581-600),
connection failure → X4 error-row isolation, the HEAD probe's
Content-Length → download_size (body never transferred), and
HEAD-preserving redirects (a redirected probe must NOT become a GET).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.sources.fetch import HttpFetcher

# deterministic bodies, sized to exercise multi-chunk streaming at
# chunk_size=1024 (the reference's 1 KiB chunks)
BODIES = {
    "/small": b"hello-crawler",
    "/page": b"<html>" + b"x" * 5000 + b"</html>",
    "/big": b"B" * 20_000,  # above the test max_bytes cap
}
HEAD_HITS: list[str] = []
GET_HITS: list[str] = []


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        GET_HITS.append(self.path)
        if self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/page")
            self.end_headers()
            return
        body = BODIES.get(self.path)
        if body is None:
            self.send_error(404, "nope")
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_HEAD(self):  # noqa: N802
        HEAD_HITS.append(self.path)
        if self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/page")
            self.end_headers()
            return
        body = BODIES.get(self.path)
        if body is None:
            self.send_error(404, "nope")
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetch_bodies_cap_and_404(spark, http_base):
    # port 9 on loopback is guaranteed-refused → genuine transport error
    urls = spark.createDataFrame(
        [(f"{http_base}/small",), (f"{http_base}/page",),
         (f"{http_base}/big",), (f"{http_base}/missing",),
         ("http://127.0.0.1:9/unreachable",)],
        "url string",
    )
    fetcher = HttpFetcher(timeout_s=10.0, chunk_size=1024, max_bytes=10_000)
    got = {r.url.rsplit("/", 1)[1]: r for r in fetcher.fetch(urls).collect()}
    assert len(got) == 5
    # streamed bodies are byte-identical (multi-chunk for /page)
    assert bytes(got["small"].html) == BODIES["/small"]
    assert bytes(got["page"].html) == BODIES["/page"]
    # the cap aborts mid-stream → X4 error row, not a task failure
    assert got["big"].html is None
    assert "max_bytes" in got["big"].error
    # 404: reference semantics — status never checked, the error-page
    # body IS the content (selenium_scraper.py:581-600)
    assert got["missing"].error is None
    assert b"404" in bytes(got["missing"].html)
    # transport failure (refused connection) → X4 error row
    assert got["unreachable"].html is None
    assert got["unreachable"].error is not None
    assert all(r.fetch_ms >= 0 for r in got.values())


def test_http_head_probe_sizes(spark, http_base):
    cand = spark.createDataFrame(
        [(1, f"{http_base}/page"), (2, f"{http_base}/missing")],
        "id int, url string",
    )
    fetcher = HttpFetcher(timeout_s=10.0)
    rows = {r.id: r for r in fetcher.head(cand).collect()}
    assert rows[1].download_size == len(BODIES["/page"])
    assert rows[2].download_size is None  # failed probe → NULL (NaN analog)
    # input columns pass through unchanged
    assert rows[1].url.endswith("/page")


def test_http_head_redirect_stays_head(spark, http_base):
    """A redirected HEAD must be re-issued as HEAD, not GET — the
    metadata-only contract (body never moves) would otherwise break on
    redirecting hosts (mediafire-style links)."""
    HEAD_HITS.clear()
    GET_HITS.clear()
    cand = spark.createDataFrame([(1, f"{http_base}/redirect")], "id int, url string")
    rows = HttpFetcher(timeout_s=10.0).head(cand).collect()
    assert rows[0].download_size == len(BODIES["/page"])
    assert "/redirect" in HEAD_HITS and "/page" in HEAD_HITS
    assert GET_HITS == []  # the probe never downgraded to GET


def test_http_fetch_inside_crawl_fetch_fn(spark, http_base):
    """The fetch_fn seam: HttpFetcher output joins back to the frontier
    columns exactly like the replay join does."""
    deq = spark.createDataFrame(
        [(f"{http_base}/small", "listing", 1),
         ("http://127.0.0.1:9/unreachable", "detail", 2)],
        "url string, kind string, dequeue_rank int",
    )
    fetched = HttpFetcher(timeout_s=10.0).fetch(deq)
    ok = fetched.filter(F.col("error").isNull())
    joined = deq.join(ok.select("url", "html"), "url")
    assert joined.count() == 1
    assert bytes(joined.first().html) == BODIES["/small"]
