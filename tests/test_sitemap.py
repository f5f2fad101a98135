"""sitemap.xml parser: urlset entries, sitemapindex entries, lastmod
whitespace, malformed docs, and the JVM-only plan shape."""

from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.functions.sitemap import sitemap_entries

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.example/a</loc><lastmod>2024-01-02</lastmod></url>
  <url>
    <loc>
      https://h.example/b
    </loc>
  </url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.example/sitemap-1.xml</loc>
    <lastmod>2024-02-01T10:00:00Z</lastmod></sitemap>
  <sitemap><loc>https://h.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_urlset_and_index_entries(spark):
    df = spark.createDataFrame(
        [("s1", URLSET), ("s2", INDEX), ("s3", "<html>not a sitemap</html>")],
        "sid string, xml string",
    )
    out = sitemap_entries(df, keep_cols=("sid",)).toPandas()
    got = sorted(map(tuple, out[["sid", "loc", "lastmod", "kind"]].values))
    assert got == [
        ("s1", "https://h.example/a", "2024-01-02", "url"),
        ("s1", "https://h.example/b", "", "url"),
        ("s2", "https://h.example/sitemap-1.xml", "2024-02-01T10:00:00Z", "sitemap"),
        ("s2", "https://h.example/sitemap-2.xml", "", "sitemap"),
    ]


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("s", URLSET)], "sid string, xml string")
    plan = sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
