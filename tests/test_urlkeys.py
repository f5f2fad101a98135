from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.functions.urlkeys import (
    canonicalize,
    with_url_keys,
)


def test_canonicalize_pure():
    assert canonicalize("HTTPS://Example.COM:443/A/b?q=1#frag") == "https://example.com/A/b?q=1"
    assert canonicalize("http://h.example:80/") == "http://h.example/"
    assert canonicalize("http://h.example:8080/x") == "http://h.example:8080/x"
    assert canonicalize("https://h.example") == "https://h.example/"


def test_with_url_keys_spark(spark):
    urls = [
        "https://h0.planetminecraft.com/project/b0-1/",
        "HTTPS://H0.PlanetMinecraft.com:443/project/b0-1/",
        "https://www.mediafire.com/file/x",
    ]
    df = with_url_keys(spark.createDataFrame([(u,) for u in urls], "url string"), n_buckets=16)
    rows = {r.url: r for r in df.collect()}
    r0 = rows[urls[0]]
    r1 = rows[urls[1]]
    # parse_url(..., 'HOST') yields the hostname (port excluded)
    assert r0.host == "h0.planetminecraft.com"
    assert r1.host == "h0.planetminecraft.com"
    # canonical forms collapse scheme/host case + default port
    assert r0.url_canon == r1.url_canon
    # raw-url hashes intentionally differ (dedup is exact-raw-match, F1)
    assert r0.url_hash != r1.url_hash
    assert 0 <= r0.bucket < 16
    # xxhash64 must agree with the JVM builtin (bloom keying contract)
    jvm = df.select(F.xxhash64("url").alias("h"), "url").collect()
    for r in jvm:
        assert rows[r.url].url_hash == r.h
