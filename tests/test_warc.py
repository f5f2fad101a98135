"""WARC source: encode→decode roundtrip, gzip-member layout, HTTP
envelope stripping, the Spark mapInPandas scan, X4 blob isolation,
and feeding the decoded records straight into a CrawlEngine pages
table (the Common-Crawl replay flow)."""

import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.sources.warc import (
    decode_warc,
    encode_warc,
    warc_records,
)

RECS = [
    ("https://h0.example.com/a", "2024-03-01T10:00:00Z", b"<html>alpha</html>"),
    ("https://h1.example.com/b", "2024-03-01T10:00:05Z", b"<html>" + b"x" * 5000 + b"</html>"),
    ("https://h0.example.com/c", "2024-03-01T10:00:09Z", b""),
]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip(gz):
    blob = encode_warc(RECS, gzip_members=gz)
    got = decode_warc(blob)
    assert [(r["url"], r["payload"]) for r in got] == [
        (u, p) for u, _, p in RECS
    ]
    assert all(r["warc_type"] == "response" for r in got)
    assert got[0]["ts"] == "2024-03-01T10:00:00Z"


def test_gzip_members_are_individually_decompressible():
    """Common Crawl's at-rest property: each record its own gzip member,
    so a reader can start at any member boundary."""
    blob = encode_warc(RECS, gzip_members=True)
    # the first member alone must decode to exactly the first record
    import zlib

    dec = zlib.decompressobj(wbits=31)
    first = dec.decompress(blob)
    # unused_data marks the start of the second member
    assert dec.unused_data != b""
    got = decode_warc(first)
    assert len(got) == 1 and got[0]["url"] == RECS[0][0]
    assert got[0]["payload"] == RECS[0][2]


def test_http_envelope_stripped():
    blob = encode_warc(RECS[:1], gzip_members=False)
    assert b"HTTP/1.1 200 OK" in blob  # the envelope exists on the wire
    got = decode_warc(blob)
    assert got[0]["payload"] == RECS[0][2]  # …but never in the payload


def test_warc_records_scan_and_x4(spark):
    good = encode_warc(RECS)
    bad = b"\x1f\x8b" + b"garbage-not-gzip"
    blobs = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(bad))],
        "file_id long, content binary",
    )
    out = warc_records(blobs).toPandas()
    ok = out[out.error.isna()].sort_values("url").reset_index(drop=True)
    assert list(ok.url) == sorted(u for u, _, _ in RECS)
    assert bytes(ok.html[list(ok.url).index(RECS[0][0])]) == RECS[0][2]
    assert ok.warc_ts.notna().all()
    errs = out[out.error.notna()]
    assert len(errs) == 1 and errs.url.isna().all()  # bad blob → one X4 row


def _archive_pages(spark, n=30):
    rows = [
        (
            f"https://h{i % 3}.example.com/p/{i}",
            f"2024-03-01 10:{i // 60:02d}:{i % 60:02d}",
            bytearray(f"<html>doc {i}</html>".encode()),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def test_write_warc_archive_roundtrip(spark, tmp_path):
    from text2mc_dataprocessor_spark.sources.warc import write_warc_archive

    out = str(tmp_path / "arch")
    idx = write_warc_archive(_archive_pages(spark), out, records_per_file=10)
    pdf = idx.toPandas()
    assert pdf.error.isna().all() and len(pdf) == 30
    assert sorted(pdf.filename.unique()) == [
        "part-00000.warc.gz", "part-00001.warc.gz", "part-00002.warc.gz"
    ]
    # index is SURT-ordered within and across files
    srt = pdf.sort_values(["file_id", "offset"]).reset_index(drop=True)
    assert list(srt.urlkey) == sorted(srt.urlkey)
    # read the whole archive back through the source
    blobs = spark.read.format("binaryFile").load(out + "/*.warc.gz")
    back = (
        warc_records(blobs)
        .filter(F.col("error").isNull())
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(back) == 30
    assert list(back.url) == sorted(pdf.url)
    assert bytes(back.html[0]).startswith(b"<html>doc ")


def test_warc_archive_random_access_and_reproducibility(spark, tmp_path):
    """(offset, length) from the index addresses one gzip member — the
    CDX random-access contract — and bytes are identical across runs."""
    import gzip

    from text2mc_dataprocessor_spark.sources.warc import write_warc_archive

    out1, out2 = str(tmp_path / "a1"), str(tmp_path / "a2")
    pages = _archive_pages(spark)
    idx = write_warc_archive(pages, out1, records_per_file=10).toPandas()
    write_warc_archive(pages, out2, records_per_file=10).count()

    row = idx.sort_values(["filename", "offset"]).iloc[17]
    with open(f"{out1}/{row.filename}", "rb") as f:
        f.seek(int(row.offset))
        member = f.read(int(row.length))
    rec = decode_warc(gzip.decompress(member))
    assert len(rec) == 1 and rec[0]["url"] == row.url

    for name in sorted(idx.filename.unique()):
        with open(f"{out1}/{name}", "rb") as a, open(f"{out2}/{name}", "rb") as b:
            assert a.read() == b.read(), name


def test_warc_feeds_crawl_pages_table(spark, tmp_path):
    """Decoded WARC records ARE the pages-table shape: run a crawl whose
    replay corpus came through the WARC source."""
    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        generate_corpus,
        pages_to_spark,
        seeds_to_spark,
    )

    corpus = generate_corpus(
        n_hosts=2, listing_pages_per_host=2, links_per_listing=4, seed=42
    )
    pages = pages_to_spark(spark, corpus).select("url", "warc_ts", "html")
    pdf = pages.toPandas()
    blob = encode_warc(
        [(r.url, r.warc_ts, bytes(r.html)) for r in pdf.itertuples(index=False)]
    )
    blobs = spark.createDataFrame([(0, bytearray(blob))], "file_id long, content binary")
    warc_pages = warc_records(blobs).filter(F.col("error").isNull()).drop("error")

    eng = CrawlEngine(
        spark, str(tmp_path / "w"), warc_pages,
        config=CrawlConfig(politeness_budget=8, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()
    got = eng.extracted_df().toPandas().sort_values("url").reset_index(drop=True)
    want = corpus.golden.sort_values("url").reset_index(drop=True)
    assert list(got.url) == list(want.url)
    assert list(got.download_url) == list(want.download_url)


def test_wet_conversion_records(spark):
    """WET layout: conversion records, text/plain, no HTTP envelope —
    text bytes roundtrip exactly through the ``wet_records`` scan, and
    a mixed WARC+WET stream filters by record type."""
    from text2mc_dataprocessor_spark.sources.warc import wet_records

    texts = [
        ("https://h0.example.com/a", "2024-03-01T10:00:00Z", "alpha text\nline two"),
        ("https://h1.example.com/b", "2024-03-01T10:00:05Z", "béta — unicode ✓"),
        ("https://h0.example.com/c", "2024-03-01T10:00:09Z", ""),
    ]
    wet = encode_warc(
        [(u, t, s.encode("utf-8")) for u, t, s in texts],
        warc_type="conversion", http_envelope=False,
    )
    # plain decode: type + untouched payload (no envelope stripping)
    got = decode_warc(wet)
    assert [r["warc_type"] for r in got] == ["conversion"] * 3
    assert [r["payload"].decode() for r in got] == [s for _, _, s in texts]
    # a response record mixed in is ignored by the WET scan
    mixed = wet + encode_warc(RECS[:1])
    blobs = spark.createDataFrame(
        [(0, bytearray(mixed))], "file_id long, content binary"
    )
    out = wet_records(blobs).orderBy("url").collect()
    assert [(r.url, r.text) for r in out] == sorted(
        [(u, s) for u, _, s in texts]
    )


def test_wet_sink_roundtrip_and_random_access(spark, tmp_path):
    """write_wet_archive → .wet.gz files that wet_records reads back
    text-byte-identically; the returned index rows give (offset,
    length) random access to single conversion records."""
    import gzip as _gzip
    import os

    import pandas as pd

    from text2mc_dataprocessor_spark.sources.warc import (
        decode_warc as _dec,
        wet_records,
        write_wet_archive,
    )

    texts = [
        (f"https://h{i % 3}.example.com/d{i}",
         pd.Timestamp("2024-03-01T00:00:00Z") + pd.Timedelta(seconds=i),
         f"doc {i} body — unicode ✓ line\nsecond line {i}")
        for i in range(13)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(texts, columns=["url", "warc_ts", "text"])
    )
    out_dir = str(tmp_path / "wet")
    idx = write_wet_archive(docs, out_dir, records_per_file=5).toPandas()
    assert idx.error.isna().all() and len(idx) == 13
    assert sorted(set(idx.filename)) == [
        "part-00000.wet.gz", "part-00001.wet.gz", "part-00002.wet.gz"]
    # read the whole archive back through the WET scan
    blobs = spark.createDataFrame(
        [(i, bytearray(open(os.path.join(out_dir, f), "rb").read()))
         for i, f in enumerate(sorted(set(idx.filename)))],
        "file_id long, content binary",
    )
    got = wet_records(blobs).toPandas().sort_values("url")
    want = pd.DataFrame(texts, columns=["url", "warc_ts", "text"]) \
        .sort_values("url")
    assert list(got.url) == list(want.url)
    assert list(got.text) == list(want.text)
    # random access: slice ONE member by (offset, length), gunzip, parse
    row = idx.sort_values(["filename", "offset"]).iloc[7]
    with open(os.path.join(out_dir, row.filename), "rb") as f:
        f.seek(int(row.offset))
        member = f.read(int(row.length))
    [rec] = _dec(_gzip.decompress(member) if member[:2] == b"\x1f\x8b"
                 else member)
    assert rec["url"] == row.url and rec["warc_type"] == "conversion"


def test_warc_records_malformed_record_yields_only_error_row(spark):
    """ADVICE r4: a blob whose record decodes but fails a per-record
    step (malformed WARC-Date) must yield ONE error row — never the
    blob's earlier rows plus an error marker."""
    good = encode_warc(RECS[:2], gzip_members=False)
    assert b"2024-" in good
    bad = good.replace(b"2024-", b"not-a-date-", 1)  # first record's date
    blobs = spark.createDataFrame(
        [(0, bytearray(bad)), (1, bytearray(encode_warc(RECS[2:])))],
        "file_id long, content binary",
    )
    out = warc_records(blobs).toPandas()
    errs = out[out.error.notna()]
    assert len(errs) == 1
    # blob 0 contributed NOTHING except its error row: the good record
    # that preceded the malformed one is absent
    assert set(out[out.error.isna()].url) == {u for u, _, _ in RECS[2:]}
