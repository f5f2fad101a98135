"""Per-page extraction byte-identity (north-rule per-row invariant).

The golden values come straight from the fixture generator's
parameters; the engine parses the HTML — two independent paths.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.functions import extract as X
from text2mc_dataprocessor_spark.sources.fixtures import pages_to_spark


def test_detail_fields_pure_python(corpus):
    pages = dict(zip(corpus.pages.url, corpus.pages.html))
    for g in corpus.golden.itertuples(index=False):
        tags, image_url, download_url = X.detail_fields(g.url, pages[g.url])
        assert tags == g.tags, g.url
        assert image_url == g.image_url, g.url
        assert download_url == g.download_url, g.url
        raw = ""
        if download_url and download_url in pages:
            raw = X.raw_download_link(download_url, pages[download_url])
        assert raw == g.raw_download_link, g.url
        assert X.extracted_record(download_url, image_url, tags, raw) == g.extracted_text


def test_listing_outlinks_match_graph(corpus):
    pages = dict(zip(corpus.pages.url, corpus.pages.html))
    graph = corpus.graph
    for url in corpus.pages.url:
        if "/projects/?p=" not in url:
            continue
        got = X.listing_outlinks(url, pages[url])
        want = [
            (r.href, r.dom_pos, r.kind)
            for r in graph[graph.page_url == url].sort_values("dom_pos").itertuples(index=False)
        ]
        assert got == want, url


def test_detail_udf_byte_identity_on_spark(spark, corpus):
    """The Arrow-batched UDF path produces byte-identical records."""
    pages_df = pages_to_spark(spark, corpus)
    detail_urls = set(corpus.golden.url)
    details = pages_df.filter(F.col("url").isin(list(detail_urls)))
    got = (
        details.withColumn("d", X.extract_detail_udf("url", "html"))
        .select("url", "d.tags", "d.image_url", "d.download_url")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        corpus.golden[["url", "tags", "image_url", "download_url"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_raw_link_udf_on_spark(spark, corpus):
    pages_df = pages_to_spark(spark, corpus)
    want = corpus.golden[corpus.golden.download_url != ""][
        ["url", "download_url", "raw_download_link"]
    ]
    dl = spark.createDataFrame(want[["url", "download_url"]])
    joined = dl.join(
        pages_df.select(F.col("url").alias("download_url"), "html"), "download_url", "left"
    )
    got = (
        joined.withColumn("raw", X.extract_raw_link_udf("download_url", "html"))
        .select("url", "raw")
        .toPandas()
        .set_index("url")["raw"]
    )
    for r in want.itertuples(index=False):
        assert got[r.url] == r.raw_download_link, r.url


@pytest.mark.parametrize(
    "html,expected",
    [
        # mirror href rejected, no third-party → ""
        (b'<a class="branded-download" href="/x/mirror/">d</a>', ""),
        # mirror rejected, third-party title last token wins
        (
            b'<a class="branded-download" href="/x/mirror/">d</a>'
            b'<a class="third-party-download" title="get it https://www.mediafire.com/f/1">t</a>',
            "https://www.mediafire.com/f/1",
        ),
        # internal beats third-party
        (
            b'<a class="branded-download" href="/dl/">d</a>'
            b'<a class="third-party-download" title="x https://m.f/2">t</a>',
            "https://h0.example/dl/",
        ),
        # no buttons at all → ""
        (b"<p>nothing</p>", ""),
    ],
)
def test_download_url_precedence(html, expected):
    _, _, download_url = X.detail_fields("https://h0.example/p/", html)
    assert download_url == expected


def test_tags_str_list_serialization():
    html = (
        b'<span class="tag"><a href="/t">Fantasy</a></span>'
        b'<span class="tag"><a href="/t">City Build</a></span>'
    )
    tags, _, _ = X.detail_fields("https://h/p/", html)
    assert tags == "['Fantasy', 'City Build']"
    tags_empty, _, _ = X.detail_fields("https://h/p/", b"<p>no tags</p>")
    assert tags_empty == "[]"


def test_first_matching_script_wins():
    html = (
        b"<script>var a=1;</script>"
        b'<script>/* schematic: mentioned but no match */</script>'
        b'<script>x = { schematic: "https://s3.aws/static.planetminecraft.com/f/a.zip?sig=1", };</script>'
        b'<script>y = { schematic: "https://s3.aws/static.planetminecraft.com/f/b.zip?sig=2", };</script>'
    )
    raw = X.raw_download_link("https://h0.planetminecraft.com/p/download/", html)
    assert raw == "https://static.planetminecraft.com/f/a.zip"
