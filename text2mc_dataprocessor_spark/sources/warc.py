"""WARC (Web ARChive, ISO 28500) source + fixture sink.

The engine's replay corpus is the parquet ``pages`` table
``(url, warc_ts, html, …)`` — the at-rest shape the input hint names.
Real web-scale corpora (Common Crawl) arrive as WARC: a stream of
records, each a CRLF-delimited header block (``WARC/1.0`` version line
+ ``Name: value`` headers, notably ``WARC-Type``, ``WARC-Target-URI``,
``WARC-Date``, ``Content-Length``) followed by exactly
``Content-Length`` payload bytes and a blank-line record separator.
At rest each record is its own gzip member, so a reader can
stream-decompress member by member and a splitter can resume at any
member boundary.

This module implements the format from the public spec with stdlib
``gzip``/``zlib`` only:

- ``encode_warc`` — fixture/sink side: (url, ts, payload) records →
  WARC bytes (one gzip member per record when ``gzip_members``,
  matching Common Crawl's layout; plain concatenation otherwise).
- ``decode_warc`` — pure-Python record iterator over WARC bytes.
- ``warc_records`` — the Spark source: a DataFrame of WARC blobs →
  one row per response record ``(url, warc_ts, html)``, ready to be a
  ``CrawlEngine`` pages table. Arrow-batched ``mapInPandas``; per-blob
  errors isolate into error rows (X4) instead of failing the scan.

Scale shape: WARC files are processed file-parallel (one blob = one
task's row; Common Crawl ships ~1 GB files × tens of thousands — ideal
partition granularity). The payload crosses to Python once, exactly
like the crawl's extraction stage. HTTP response records carry the
raw HTTP response (status line + headers + body); ``warc_records``
strips those headers to yield the body, as WARC consumers do.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_SCHEMA = "url string, warc_ts timestamp, html binary, error string"

_CRLF = b"\r\n"


def _format_ts(ts) -> str:
    """pandas/py datetime → WARC-Date (ISO-8601 Zulu, second precision)."""
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")


def encode_warc(records, gzip_members: bool = True,
                warc_type: str = "response",
                http_envelope: bool = True) -> bytes:
    """``records``: iterable of (url, ts, payload bytes). Emits one
    record of ``warc_type`` per entry. The default is the Common Crawl
    WARC layout: ``response`` records whose payload is wrapped as a
    minimal HTTP/1.1 200 response block. ``warc_type='conversion',
    http_envelope=False`` is the WET layout — extracted-text sidecar
    records (Content-Type text/plain, bare payload), the shape
    text-pipeline consumers read instead of raw HTML. One gzip member
    per record when ``gzip_members`` — the split-anywhere at-rest
    shape."""
    out = io.BytesIO()
    for url, ts, payload in records:
        if http_envelope:
            body = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html" + _CRLF
                + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF + payload
            )
            ctype = b"application/http; msgtype=response"
        else:
            body = payload
            ctype = b"text/plain"
        hdr = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + warc_type.encode() + _CRLF
            + b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + _format_ts(ts).encode() + _CRLF
            + b"Content-Type: " + ctype + _CRLF
            + b"Content-Length: " + str(len(body)).encode() + _CRLF
            + _CRLF
        )
        rec = hdr + body + _CRLF + _CRLF
        out.write(gzip.compress(rec) if gzip_members else rec)
    return out.getvalue()


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers


def decode_warc(data: bytes) -> list[dict]:
    """WARC bytes (gzip members, a single gzip stream, or plain) →
    [{url, ts, warc_type, payload}]. The HTTP response envelope is
    stripped — ``payload`` is the body."""
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile reads members back-to-back
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data[pos:].startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at offset {pos}")
        hdr_end = data.index(_CRLF + _CRLF, pos)
        headers = _split_headers(data[pos:hdr_end])
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC record payload")
        if headers.get("content-type", "").startswith("application/http"):
            # strip the HTTP response envelope
            split = payload.find(_CRLF + _CRLF)
            if split >= 0:
                payload = payload[split + 4:]
        records.append({
            "url": headers.get("warc-target-uri", ""),
            "ts": headers.get("warc-date", ""),
            "warc_type": headers.get("warc-type", ""),
            "payload": payload,
        })
        pos = body_start + length
    return records


WARC_INDEX_SCHEMA = (
    "file_id long, urlkey string, url string, warc_ts timestamp,"
    " filename string, offset long, length long, error string"
)


def write_warc_archive(pages: DataFrame, out_dir: str,
                       records_per_file: int = 10_000,
                       prefix: str = "part",
                       warc_type: str = "response",
                       http_envelope: bool = True,
                       suffix: str = ".warc.gz") -> DataFrame:
    """Distributed WARC **sink**: a pages table ``(url, warc_ts, html)``
    → ``<out_dir>/<prefix>-<file_id>.warc.gz`` files of
    ``records_per_file`` records each, clustered and ordered by SURT
    urlkey (the archive convention — a CDX range maps to a contiguous
    run of files), one gzip member per record with ``mtime=0`` so
    archive bytes are reproducible.

    Returns one INDEX row per record: ``(file_id, urlkey, url, warc_ts,
    filename, offset, length, error)`` — offset/length address the
    record's own gzip member for random access, which is exactly the
    CDX contract; feed the result to ``functions.cdx.cdxj_lines`` with
    ``meta_cols=("filename", "offset", "length")`` to emit the
    companion index. A failing file isolates into one error row (X4).

    Scale shape: file assignment is the engine's two-phase distributed
    rank over urlkey (no single-partition window), then one
    ``groupBy(file_id).applyInPandas`` — each task writes its own file,
    so a 10^5-file archive is embarrassingly file-parallel, like the
    HDF5 sink (sources/hdf5.py)."""
    import os

    from pyspark.sql import functions as F

    from ..functions.cdx import surt_key_col
    from ..operators.frontier import with_global_rank

    os.makedirs(out_dir, exist_ok=True)
    keyed = pages.select(
        surt_key_col("url").alias("urlkey"), "url", "warc_ts", "html"
    )
    ranked = with_global_rank(keyed, [F.col("urlkey"), F.col("url")])
    staged = ranked.withColumn(
        "file_id", F.floor((F.col("rank") - 1) / records_per_file).cast("long")
    )

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        filename = f"{prefix}-{fid:05d}{suffix}"
        path = os.path.join(out_dir, filename)
        pdf = pdf.sort_values(["urlkey", "url"], kind="stable")
        try:
            rows = []
            offset = 0
            with open(path, "wb") as f:
                for url, ts, key, payload in zip(
                    pdf["url"], pdf["warc_ts"], pdf["urlkey"], pdf["html"]
                ):
                    member = encode_warc_member(
                        url, ts, bytes(payload),
                        warc_type=warc_type, http_envelope=http_envelope)
                    f.write(member)
                    rows.append((fid, key, url, ts, filename, offset,
                                 len(member), None))
                    offset += len(member)
            return pd.DataFrame(rows, columns=[
                "file_id", "urlkey", "url", "warc_ts", "filename",
                "offset", "length", "error",
            ])
        except Exception as e:  # noqa: BLE001 — X4 per-file isolation
            return pd.DataFrame(
                [(fid, None, None, None, filename, None, None, str(e)[:200])],
                columns=["file_id", "urlkey", "url", "warc_ts", "filename",
                         "offset", "length", "error"],
            )

    return staged.groupBy("file_id").applyInPandas(per_file, WARC_INDEX_SCHEMA)


def encode_warc_member(url: str, ts, payload: bytes,
                       warc_type: str = "response",
                       http_envelope: bool = True) -> bytes:
    """One (url, ts, payload) → one reproducible gzip member
    (``mtime=0`` — byte-identical re-runs; Common Crawl's at-rest unit,
    addressable by (offset, length) from the CDX index)."""
    rec = encode_warc([(url, ts, payload)], gzip_members=False,
                      warc_type=warc_type, http_envelope=http_envelope)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(rec)
    return buf.getvalue()


def warc_records(blobs: DataFrame, bin_col: str = "content",
                 types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Spark source: (… , content binary) one WARC file per row →
    one row per record of the requested ``types``:
    ``(url, warc_ts, html, error)``. A malformed blob yields ONE error
    row (url NULL, error set) instead of failing the scan (X4)."""
    want = set(types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[bin_col]:
                # convert the WHOLE blob into a local list before
                # extending the batch: a record that decodes but fails a
                # later per-record step (e.g. a malformed WARC-Date)
                # must not leave the blob's earlier rows alongside the
                # error row — one blob yields EITHER its rows OR one
                # error row, never both.
                blob_rows = []
                try:
                    for rec in decode_warc(bytes(blob)):
                        if rec["warc_type"] in want:
                            t = pd.Timestamp(rec["ts"]) if rec["ts"] else None
                            if t is not None and t.tzinfo is not None:
                                t = t.tz_convert(None)  # naive UTC (Z dates)
                            blob_rows.append(
                                (rec["url"], t, rec["payload"], None))
                except Exception as e:  # noqa: BLE001 — X4 isolation
                    rows.append((None, None, None, str(e)[:200]))
                else:
                    rows.extend(blob_rows)
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "error"])

    return blobs.select(bin_col).mapInPandas(run, WARC_SCHEMA)


WET_SCHEMA = "url string, warc_ts timestamp, text string, error string"


def wet_records(blobs: DataFrame, bin_col: str = "content") -> DataFrame:
    """WET source: (…, content binary) one WET file per row → one row
    per ``conversion`` record, payload decoded as UTF-8 text:
    ``(url, warc_ts, text, error)`` — the extracted-text sidecar shape
    (Common Crawl's .wet companion to each .warc). Same file-parallel
    scale shape and X4 isolation as ``warc_records``; undecodable bytes
    are replaced, never fatal."""
    from pyspark.sql import functions as F

    recs = warc_records(blobs, bin_col=bin_col, types=("conversion",))
    return recs.select(
        "url", "warc_ts",
        F.decode(F.col("html"), "UTF-8").alias("text"),
        "error",
    )


def write_wet_archive(docs: DataFrame, out_dir: str,
                      records_per_file: int = 10_000,
                      prefix: str = "part",
                      text_col: str = "text") -> DataFrame:
    """Distributed WET **sink** — the extracted-text companion of
    ``write_warc_archive``: ``(url, warc_ts, text)`` →
    ``<out_dir>/<prefix>-<file_id>.wet.gz`` files of WARC
    ``conversion`` records (bare UTF-8 text/plain payload, no HTTP
    envelope — the layout ``wet_records`` reads back), SURT-clustered,
    one reproducible mtime=0 gzip member per record. Returns the same
    per-record random-access index rows as the WARC sink, so a CDXJ
    index over a WET archive is the same ``cdxj_lines`` call."""
    from pyspark.sql import functions as F

    pages = docs.select(
        "url", "warc_ts", F.encode(F.col(text_col), "UTF-8").alias("html"))
    return write_warc_archive(
        pages, out_dir, records_per_file, prefix=prefix,
        warc_type="conversion", http_envelope=False, suffix=".wet.gz")
