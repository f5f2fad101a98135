"""Page-extraction semantics of the reference scraper, re-expressed as
Arrow-batched pandas UDFs (no per-row Python UDFs — input_hint).

Reference semantics reproduced exactly (file:line cites into
/root/reference/scraper/selenium_scraper.py):

- listing outlinks: per ``.r-info`` element, the first descendant
  ``a[href^="/project"]`` (raw-attribute prefix match), href absolutized,
  DOM order (139-189); plus the ``pagination_next`` element's href (185-186).
- tags: every ``.tag`` element's first descendant ``<a>`` text, collected
  in DOM order, serialized as Python ``str(list)`` (432-441). A page with
  zero tags yields ``"[]"`` (still truthy → column is set, 231-232).
- image_url: first ``picture.lg-img-wrap source[srcset$="_l.jpg"]``
  srcset, else ``""`` (237-250).
- download_url: first ``.branded-download`` href unless it contains
  "mirror" (→ treated as absent, 366-380); if absent/empty, fall back to
  the first ``.third-party-download``'s title's last whitespace token
  (349-362); else ``""`` (253-268).
- raw_download_link (computed on the *download page*, dispatched by the
  download_url string, 317-328):
  - "planetminecraft.com" in download_url → scan ``<script>`` elements in
    DOM order; for the scripts containing "schematic:", regex
    ``schematic: "(.*?)",`` (DOTALL) then
    ``static\\.planetminecraft\\.com(.*?\\.\\w+)``; the first script
    producing BOTH matches wins (445-476); result
    ``https://static.planetminecraft.com{path}``.
  - "mediafire" in download_url → ``#downloadButton`` href (480-498).
  - otherwise → "" (327-328).

Byte-identity: ``extracted_text = "\\x1f".join([download_url, image_url,
tags, raw_download_link])`` is the per-url record compared byte-for-byte
against the oracle (north rule / FIXTURES.md §5).
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .htmlparse import Element, parse_html, resolve_href

FIELD_SEP = "\x1f"

_SCHEMATIC_RE = re.compile(r'schematic: "(.*?)",', re.DOTALL)
_S3_PATH_RE = re.compile(r"static\.planetminecraft\.com(.*?\.\w+)")


# ---------------------------------------------------------------------------
# Pure per-page functions (shared by the UDFs below; unit-tested directly)
# ---------------------------------------------------------------------------

def listing_outlinks(page_url: str, html: bytes | str) -> list[tuple[str, int, str]]:
    """→ [(absolute_href, dom_pos, kind)] — detail links then pagination."""
    root = parse_html(html)
    out: list[tuple[str, int, str]] = []
    pos = 0
    for r_info in root.find_all_by_class("r-info"):
        anchor = None
        for a in r_info.find_all_by_tag("a"):
            href = a.attr("href")
            if href is not None and href.startswith("/project"):
                anchor = a
                break
        if anchor is None:
            continue
        out.append((resolve_href(page_url, anchor.attr("href")), pos, "detail"))
        pos += 1
    pagers = root.find_all_by_class("pagination_next")
    if pagers:
        nxt = resolve_href(page_url, pagers[0].attr("href"))
        if nxt:
            out.append((nxt, pos, "listing"))
    return out


def _tags_of(root: Element) -> str:
    tags_list: list[str] = []
    for tag_el in root.find_all_by_class("tag"):
        anchors = tag_el.find_all_by_tag("a")
        if not anchors:
            # reference raises NoSuchElement → whole tags scrape aborts → ""
            return ""
        tags_list.append(anchors[0].text())
    return str(tags_list)


def _image_url_of(root: Element) -> str:
    for pic in root.find_all_by_tag("picture"):
        if "lg-img-wrap" not in pic.classes():
            continue
        for src in pic.find_all_by_tag("source"):
            srcset = src.attr("srcset")
            if srcset is not None and srcset.endswith("_l.jpg"):
                return srcset
    return ""


def _internal_download_link(root: Element, page_url: str) -> str | None:
    # selenium_scraper.py:366-380 — "" when no button (falsy), None when
    # the href contains "mirror" (exception path)
    href = ""
    buttons = root.find_all_by_class("branded-download")
    if buttons:
        href = resolve_href(page_url, buttons[0].attr("href"))
    if "mirror" in href:
        return None
    return href


def _third_party_download_link(root: Element) -> str | None:
    # selenium_scraper.py:349-362 — last whitespace token of the title;
    # no element → NameError → bare except → None
    buttons = root.find_all_by_class("third-party-download")
    if not buttons:
        return None
    title = buttons[0].attr("title")
    if title is None:
        return None
    return title.split(" ")[-1]


def detail_fields(page_url: str, html: bytes | str) -> tuple[str, str, str]:
    """→ (tags_str, image_url, download_url) per reference precedence."""
    root = parse_html(html)
    tags = _tags_of(root)
    image_url = _image_url_of(root)
    internal = _internal_download_link(root, page_url)
    download_url = ""
    if internal:
        download_url = internal
    else:
        third = _third_party_download_link(root)
        if third:
            download_url = third
    return tags, image_url, download_url


def raw_download_link(download_url: str, html: bytes | str | None) -> str:
    """Raw artifact URL from the download page, host-dispatched."""
    if not download_url or html is None:
        return ""
    if "planetminecraft.com" in download_url:
        root = parse_html(html)
        for script in root.find_all_by_tag("script"):
            body = script.inner_html_text()
            if "schematic:" not in body:
                continue
            m = _SCHEMATIC_RE.search(body)
            if not m:
                continue
            path = _S3_PATH_RE.search(m.group(1))
            if path:
                return f"https://static.planetminecraft.com{path.group(1)}"
        return ""
    if "mediafire" in download_url:
        root = parse_html(html)
        btn = root.find_by_id("downloadButton")
        if btn is not None:
            href = btn.attr("href")
            return resolve_href(download_url, href) if href is not None else ""
        return ""
    return ""


def extracted_record(download_url: str, image_url: str, tags: str, raw_link: str) -> str:
    return FIELD_SEP.join([download_url, image_url, tags, raw_link])


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDFs
# ---------------------------------------------------------------------------

OUTLINK_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType(), False),
            T.StructField("dom_pos", T.IntegerType(), False),
            T.StructField("kind", T.StringType(), False),
        ]
    )
)

DETAIL_TYPE = T.StructType(
    [
        T.StructField("tags", T.StringType(), False),
        T.StructField("image_url", T.StringType(), False),
        T.StructField("download_url", T.StringType(), False),
    ]
)


@F.pandas_udf(OUTLINK_TYPE)
def extract_outlinks_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    def one(u, h):
        if h is None:
            return []
        try:
            return listing_outlinks(u, h)
        except Exception:
            return []  # X4 per-row error isolation (selenium_scraper.py:176-178)

    return pd.Series([one(u, h) for u, h in zip(url, html)])


@F.pandas_udf(DETAIL_TYPE)
def extract_detail_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    rows = []
    for u, h in zip(url, html):
        if h is None:
            rows.append(("", "", ""))
            continue
        try:
            rows.append(detail_fields(u, h))
        except Exception:
            rows.append(("", "", ""))
    return pd.DataFrame(rows, columns=["tags", "image_url", "download_url"])


@F.pandas_udf(T.StringType())
def extract_raw_link_udf(download_url: pd.Series, html: pd.Series) -> pd.Series:
    def one(u, h):
        try:
            return raw_download_link(u or "", h)
        except Exception:
            return ""

    return pd.Series([one(u, h) for u, h in zip(download_url, html)])


def extract_all_arrow_factory(passthrough_cols: list[str]):
    """Single-pass extraction for ``mapInArrow``: one worker round trip
    parses every fetched page once and emits all extraction fields,
    dispatched by the row's frontier ``kind`` (listing → outlinks,
    detail → tags/image/download_url, download → raw link).

    Measured ~2× the throughput of the three scalar-pandas-UDF branches
    (one Arrow crossing for the html bytes, no pandas Series
    materialization, and the html column never travels back).

    Input batches must carry ``url``, ``kind``, ``html`` plus
    ``passthrough_cols``; output schema is
    ``passthrough + url/kind + tags, image_url, download_url, raw_link,
    outlinks``.
    """
    import pyarrow as pa

    outlink_t = pa.list_(
        pa.struct([("href", pa.string()), ("dom_pos", pa.int32()), ("kind", pa.string())])
    )

    def extract_all(batches):
        for batch in batches:
            cols = {name: batch.column(name) for name in batch.schema.names}
            urls = cols["url"].to_pylist()
            kinds = cols["kind"].to_pylist()
            htmls = cols["html"].to_pylist()
            tags_a, img_a, dl_a, raw_a, out_a = [], [], [], [], []
            for u, k, h in zip(urls, kinds, htmls):
                tags = img = dl = raw = ""
                links: list = []
                try:
                    if h is None:
                        pass
                    elif k == "listing":
                        links = [
                            {"href": href, "dom_pos": pos, "kind": kk}
                            for href, pos, kk in listing_outlinks(u, h)
                        ]
                    elif k == "detail":
                        tags, img, dl = detail_fields(u, h)
                    elif k == "download":
                        raw = raw_download_link(u, h)
                except Exception:
                    # X4 per-row error isolation (selenium_scraper.py:176-178)
                    tags = img = dl = raw = ""
                    links = []
                tags_a.append(tags)
                img_a.append(img)
                dl_a.append(dl)
                raw_a.append(raw)
                out_a.append(links)
            arrays = [cols[c] for c in passthrough_cols]
            arrays += [
                cols["url"],
                cols["kind"],
                pa.array(tags_a, pa.string()),
                pa.array(img_a, pa.string()),
                pa.array(dl_a, pa.string()),
                pa.array(raw_a, pa.string()),
                pa.array(out_a, outlink_t),
            ]
            names = list(passthrough_cols) + [
                "url", "kind", "tags", "image_url", "download_url", "raw_link", "outlinks",
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return extract_all


def extract_all_schema(passthrough_schema: str) -> str:
    return (
        passthrough_schema
        + (", " if passthrough_schema else "")
        + "url string, kind string, tags string, image_url string, "
        "download_url string, raw_link string, "
        "outlinks array<struct<href:string,dom_pos:int,kind:string>>"
    )


def page_text(html: bytes | str) -> str:
    """Plain-text rendering for the ``pages.text`` column."""
    return parse_html(html).text()


def iter_page_text(batches: Iterable[pd.DataFrame]):
    for pdf in batches:
        pdf = pdf.copy()
        pdf["text"] = [page_text(h) if h is not None else "" for h in pdf["html"]]
        yield pdf
