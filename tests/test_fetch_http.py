"""S5/S6 HTTP path exercised for real against a loopback http.server —
no external network. Covers: streamed GET bodies (multi-chunk), the
50 MB-cap abort (here shrunk), 404 → X4 error-row isolation, and the
HEAD probe's Content-Length → download_size (body never transferred).
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


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
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
    urls = spark.createDataFrame(
        [(f"{http_base}/small",), (f"{http_base}/page",),
         (f"{http_base}/big",), (f"{http_base}/missing",)],
        "url string",
    )
    fetcher = HttpFetcher(timeout_s=10.0, chunk_size=1024, max_bytes=10_000)
    got = {r.url.rsplit("/", 1)[1]: r for r in fetcher.fetch(urls).collect()}
    assert len(got) == 4
    # streamed bodies are byte-identical (multi-chunk for /page)
    assert bytes(got["small"].html) == BODIES["/small"]
    assert bytes(got["page"].html) == BODIES["/page"]
    # the cap aborts mid-stream → X4 error row, not a task failure
    assert got["big"].html is None
    assert "max_bytes" in got["big"].error
    # 404 → error row too
    assert got["missing"].html is None
    assert "404" in got["missing"].error
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


def test_http_fetch_inside_crawl_fetch_fn(spark, http_base):
    """The fetch_fn seam: HttpFetcher output joins back to the frontier
    columns exactly like the replay join does."""
    deq = spark.createDataFrame(
        [(f"{http_base}/small", "listing", 1), (f"{http_base}/missing", "detail", 2)],
        "url string, kind string, dequeue_rank int",
    )
    fetched = HttpFetcher(timeout_s=10.0).fetch(deq)
    ok = fetched.filter(F.col("error").isNull())
    joined = deq.join(ok.select("url", "html"), "url")
    assert joined.count() == 1
    assert bytes(joined.first().html) == BODIES["/small"]
