"""sitemap.xml parsing — crawl seed discovery.

The discovery loop's other standard input (robots.txt names them via
``Sitemap:`` lines): ``<urlset>`` documents list page URLs (+ optional
``<lastmod>``), ``<sitemapindex>`` documents list child sitemaps. Both
parse ENTIRELY JVM-side: ``regexp_extract_all`` pulls the
``<url>``/``<sitemap>`` entry blocks (dotall), a higher-order
``transform`` lifts each block to a (loc, lastmod) struct, and one
explode yields the rows — no Python in the path, so feeding a million
fetched sitemaps through this is just another codegen stage.

Scope: the fields a frontier consumes (loc, lastmod, entry kind).
``changefreq``/``priority`` are advisory and widely ignored by
crawlers; add columns the same way if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _entries(xml, tag: str):
    blocks = F.regexp_extract_all(xml, F.lit(f"(?s)<{tag}[^>]*>(.*?)</{tag}>"), 1)
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, r"<loc>\s*([^<\s][^<]*?)\s*</loc>", 1).alias("loc"),
            F.regexp_extract(b, r"<lastmod>\s*([^<\s][^<]*?)\s*</lastmod>", 1).alias(
                "lastmod"
            ),
        ),
    )


def sitemap_entries(df: DataFrame, xml_col: str = "xml",
                    keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(…, xml) one sitemap document per row → one row per entry:
    ``keep_cols…, loc, lastmod, kind`` with ``kind`` = 'url' (page
    entry from a <urlset>) or 'sitemap' (child sitemap from a
    <sitemapindex>). Entries without <lastmod> carry ''. Malformed or
    empty documents simply yield no rows — sitemaps are advisory input,
    not state."""
    xml = F.col(xml_col)
    both = F.concat(
        F.transform(
            _entries(xml, "url"),
            lambda s: F.struct(
                s["loc"].alias("loc"), s["lastmod"].alias("lastmod"),
                F.lit("url").alias("kind"),
            ),
        ),
        F.transform(
            _entries(xml, "sitemap"),
            lambda s: F.struct(
                s["loc"].alias("loc"), s["lastmod"].alias("lastmod"),
                F.lit("sitemap").alias("kind"),
            ),
        ),
    )
    return (
        df.select(*keep_cols, F.explode(both).alias("e"))
        .filter(F.col("e.loc") != "")
        .select(*keep_cols, "e.loc", "e.lastmod", "e.kind")
    )
