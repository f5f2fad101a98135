from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.functions.urlkeys import (
    canonical_url_col,
    canonicalize,
    with_url_keys,
)

# the parity battery: every corner the JVM expression and the Python
# mirror must agree on, including RFC 3986 dot-segment cases
CANON_CASES = [
    "HTTPS://Example.COM:443/A/b?q=1#frag",
    "http://h.example:80/",
    "http://h.example:8080/x",
    "https://h.example",
    "https://h.example/a/./b/../c",
    "https://h.example/a/b/../",
    "https://h.example/a/.",
    "https://h.example/a/..",
    "https://h.example/../x",
    "https://h.example/a//b/",          # empty segments preserved
    "https://h.example/p#f?notquery",   # fragment starts at first '#'
    "https://User@H.example/x",
    "https://h.example:8443/x",         # ':8443' is NOT ':443'
    "HTTP://h.example?q=2",
    "not-a-url",
    "relative/path/only",
]


def test_canonicalize_pure():
    assert canonicalize("HTTPS://Example.COM:443/A/b?q=1#frag") == "https://example.com/A/b?q=1"
    assert canonicalize("http://h.example:80/") == "http://h.example/"
    assert canonicalize("http://h.example:8080/x") == "http://h.example:8080/x"
    assert canonicalize("https://h.example") == "https://h.example/"
    # dot-segment resolution (RFC 3986 §5.2.4)
    assert canonicalize("https://h.example/a/./b/../c") == "https://h.example/a/c"
    assert canonicalize("https://h.example/a/b/../") == "https://h.example/a/"
    assert canonicalize("https://h.example/a/.") == "https://h.example/a/"
    assert canonicalize("https://h.example/../x") == "https://h.example/x"
    assert canonicalize("https://h.example/a//b/") == "https://h.example/a//b/"


def test_canonical_jvm_matches_python_and_stays_in_codegen(spark):
    df = spark.createDataFrame([(u,) for u in CANON_CASES], "url string")
    out = df.select("url", canonical_url_col("url").alias("canon"))
    got = {r.url: r.canon for r in out.collect()}
    for u in CANON_CASES:
        assert got[u] == canonicalize(u), u
    # the hot path never leaves the JVM (higher-order aggregate lambdas
    # are interpreted Catalyst expressions — still JVM, no Python eval)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


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
