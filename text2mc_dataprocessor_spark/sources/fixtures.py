"""Deterministic Common-Crawl-style fixture corpus.

Generates the authoritative input-table shape from BASELINE.json
input_hint — ``pages(url string, warc_ts timestamp, html binary,
text string, lang string)`` — as a synthetic web graph whose pages embed
exactly the structures the reference scraper extracts (FIXTURES.md §1):

- listing pages: ``.r-info`` blocks with ``a[href^="/project"]`` anchors
  in DOM order + a ``pagination_next`` link (relative hrefs, so the
  engine's href absolutization is exercised);
- detail pages: tag lists, ``_l.jpg`` srcset images, branded /
  mirror / third-party download buttons in all combinations;
- internal download pages: ``schematic: "..."`` script variants
  including decoy scripts and first-match-wins cases;
- mediafire pages: ``#downloadButton`` present/absent.

Alongside the pages it emits the *golden* per-detail-url extraction
(computed straight from the generation parameters, NOT by parsing), the
seed list, and a robots table. Everything is a pure function of the
seed — no external data, no wall clock.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd

from ..functions.extract import extracted_record, page_text

MEDIAFIRE_HOST = "www.mediafire.com"

_TAG_VOCAB = [
    "Fantasy",
    "Medieval",
    "Modern",
    "Castle",
    "House",
    "Redstone",
    "City Build",
    "Landscape",
    "3D Art",
]

_BASE_TS = datetime(2024, 10, 1, 0, 0, 0)


def host_name(i: int) -> str:
    return f"h{i}.planetminecraft.com"


@dataclass
class Corpus:
    pages: pd.DataFrame  # url, warc_ts, html, text, lang
    seeds: pd.DataFrame  # url, seed_rank
    golden: pd.DataFrame  # url, download_url, image_url, tags, raw_download_link, extracted_text
    robots: pd.DataFrame  # host, disallow_prefixes, crawl_delay_ms
    graph: pd.DataFrame  # page_url, dom_pos, href, kind — golden outlink graph
    params: dict = field(default_factory=dict)


def _listing_html(anchors: list[str], next_href: str | None, decoys: bool) -> str:
    parts = ["<html><head><title>Projects</title></head><body>"]
    if decoys:
        parts.append('<div class="r-info"><h3>No link here</h3><span>decoy</span></div>')
    for href in anchors:
        parts.append(
            f'<div class="r-info"><a href="/member/x">author</a>'
            f'<a href="{href}">Project</a></div>'
        )
    if next_href is not None:
        parts.append(f'<a class="pagination_next" href="{next_href}">Next</a>')
    parts.append("</body></html>")
    return "".join(parts)


def _detail_html(
    tags: list[str],
    image_srcset: str | None,
    branded_href: str | None,
    third_party_title: str | None,
) -> str:
    parts = ["<html><body><h1>Build</h1>"]
    for t in tags:
        parts.append(f'<span class="tag"><a href="/tag">{t}</a></span>')
    if image_srcset is not None:
        parts.append(
            f'<picture class="lg-img-wrap"><source srcset="{image_srcset}">'
            f"<img src=\"thumb.jpg\"></picture>"
        )
        # a small decoy that must NOT match (srcset does not end in _l.jpg)
        parts.append(
            '<picture class="lg-img-wrap"><source srcset="https://cdn.example/x_s.jpg"></picture>'
        )
    if branded_href is not None:
        parts.append(f'<a class="branded-download" href="{branded_href}">Download</a>')
    if third_party_title is not None:
        parts.append(
            f'<a class="third-party-download" title="{third_party_title}">External</a>'
        )
    parts.append("</body></html>")
    return "".join(parts)


def _internal_download_html(variant: str, s3_path: str) -> str:
    good = (
        "<script>var settings = { foo: 1, schematic: "
        f'"https://s3.amazonaws.com/static.planetminecraft.com{s3_path}?X-Amz-Sig=abc", '
        "bar: 2 };</script>"
    )
    decoy_no_kw = "<script>console.log('analytics');</script>"
    decoy_kw_no_match = "<script>// mentions schematic: but no quoted url here</script>"
    decoy_kw_no_s3 = '<script>var a = { schematic: "https://other.cdn/file.zip?x=1", };</script>'
    if variant == "plain":
        return f"<html><body>{good}</body></html>"
    if variant == "decoy_first":
        return f"<html><body>{decoy_no_kw}{good}</body></html>"
    if variant == "kw_nomatch_first":
        return f"<html><body>{decoy_kw_no_match}{good}</body></html>"
    if variant == "kw_no_s3_first":
        # first matching script has no static.planetminecraft.com part →
        # loop continues to the good script (selenium_scraper.py:460-469)
        return f"<html><body>{decoy_kw_no_s3}{good}</body></html>"
    if variant == "none":
        return f"<html><body>{decoy_no_kw}{decoy_kw_no_match}</body></html>"
    raise ValueError(variant)


def _mediafire_html(slug: str, with_button: bool) -> str:
    if with_button:
        return (
            "<html><body>"
            f'<a id="downloadButton" href="https://download1472.mediafire.com/dl/{slug}.zip">'
            "Download</a></body></html>"
        )
    return "<html><body><div>File unavailable</div></body></html>"


def generate_corpus(
    n_hosts: int = 4,
    listing_pages_per_host: int = 4,
    links_per_listing: int = 8,
    seed: int = 42,
    skew_host0: int = 1,
    lang_minority: float = 0.1,
) -> Corpus:
    """Build the synthetic crawl corpus.

    ``skew_host0`` multiplies host 0's listing-page count — at bench
    scale set it so host 0 holds ~half the URLs (exercises the salted
    fetch repartition, SURVEY §4 skew row).
    """
    rng = random.Random(seed)
    page_rows: list[tuple[str, datetime, bytes, str]] = []
    golden_rows: list[dict] = []
    graph_rows: list[tuple[str, int, str, str]] = []
    seeds: list[tuple[str, int]] = []
    seen_details: set[str] = set()

    for i in range(n_hosts):
        h = host_name(i)
        n_listing = listing_pages_per_host * (skew_host0 if i == 0 else 1)
        seeds.append((f"https://{h}/projects/?p=0", i))
        prev_hrefs: list[str] = []
        detail_idx = 0
        for k in range(n_listing):
            listing_url = f"https://{h}/projects/?p={k}"
            hrefs = []
            for _ in range(links_per_listing):
                slug = f"b{i}-{detail_idx}"
                hrefs.append(f"/project/{slug}/")
                detail_idx += 1
            # duplicate injection: repeat an earlier href (dedup F1)
            if prev_hrefs and rng.random() < 0.6:
                hrefs.insert(rng.randrange(len(hrefs)), rng.choice(prev_hrefs))
            prev_hrefs.extend(hrefs)
            next_href = f"/projects/?p={k + 1}" if k < n_listing - 1 else None
            html = _listing_html(hrefs, next_href, decoys=(k % 2 == 0))
            page_rows.append((listing_url, html))
            for pos, href in enumerate(hrefs):
                graph_rows.append((listing_url, pos, f"https://{h}{href}", "detail"))
            if next_href is not None:
                graph_rows.append(
                    (listing_url, len(hrefs), f"https://{h}{next_href}", "listing")
                )

            for href in hrefs:
                slug = href.split("/")[2]
                detail_url = f"https://{h}{href}"
                if detail_url in seen_details:
                    continue  # duplicate anchor — one page per url
                seen_details.add(detail_url)
                _gen_detail(rng, h, slug, detail_url, page_rows, golden_rows)
                g = golden_rows[-1]
                if g["download_url"]:
                    graph_rows.append((detail_url, 0, g["download_url"], "download"))

    df_pages = _pages_df(page_rows, rng, lang_minority)
    df_seeds = pd.DataFrame(seeds, columns=["url", "seed_rank"])
    df_golden = pd.DataFrame(
        golden_rows,
        columns=["url", "download_url", "image_url", "tags", "raw_download_link", "extracted_text"],
    )
    df_robots = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(n_hosts)] + [MEDIAFIRE_HOST],
            "disallow_prefixes": [[] for _ in range(n_hosts)] + [[]],
            "crawl_delay_ms": [0] * (n_hosts + 1),
        }
    )
    df_graph = pd.DataFrame(graph_rows, columns=["page_url", "dom_pos", "href", "kind"])
    return Corpus(
        pages=df_pages,
        seeds=df_seeds,
        golden=df_golden,
        robots=df_robots,
        graph=df_graph,
        params=dict(
            n_hosts=n_hosts,
            listing_pages_per_host=listing_pages_per_host,
            links_per_listing=links_per_listing,
            seed=seed,
            skew_host0=skew_host0,
        ),
    )


def _gen_detail(rng, h, slug, detail_url, page_rows, golden_rows) -> None:
    n_tags = rng.randrange(0, 5)
    tags = [rng.choice(_TAG_VOCAB) for _ in range(n_tags)]
    has_image = rng.random() < 0.8
    image_srcset = (
        f"https://cdn.planetminecraft.com/files/image/{slug}_l.jpg" if has_image else None
    )

    link_variant = rng.randrange(0, 6)
    dl_rel = f"/project/{slug}/download/"
    dl_abs = f"https://{h}{dl_rel}"
    mirror_rel = f"/project/{slug}/download/mirror/"
    mf_url = f"https://{MEDIAFIRE_HOST}/file/{slug}"
    tp_title = f"Download from external site {mf_url}"

    branded_href: str | None
    third_title: str | None
    if link_variant == 0:  # branded only
        branded_href, third_title = dl_rel, None
        download_url = dl_abs
    elif link_variant == 1:  # mirror branded + third-party → third-party wins
        branded_href, third_title = mirror_rel, tp_title
        download_url = mf_url
    elif link_variant == 2:  # mirror branded, nothing else → ""
        branded_href, third_title = mirror_rel, None
        download_url = ""
    elif link_variant == 3:  # third-party only
        branded_href, third_title = None, tp_title
        download_url = mf_url
    elif link_variant == 4:  # nothing
        branded_href, third_title = None, None
        download_url = ""
    else:  # both present → internal wins (selenium_scraper.py:259-266)
        branded_href, third_title = dl_rel, tp_title
        download_url = dl_abs

    page_rows.append(
        (detail_url, _detail_html(tags, image_srcset, branded_href, third_title))
    )

    raw_link = ""
    if download_url == dl_abs:
        variant = rng.choice(
            ["plain", "decoy_first", "kw_nomatch_first", "kw_no_s3_first", "none"]
        )
        ext = rng.choice(["zip", "rar", "schematic", "schem", "litematic"])
        s3_path = f"/files/resource_media/schematic/{slug}.{ext}"
        page_rows.append((dl_abs, _internal_download_html(variant, s3_path)))
        if variant != "none":
            raw_link = f"https://static.planetminecraft.com{s3_path}"
    elif download_url == mf_url:
        with_button = rng.random() < 0.8
        page_rows.append((mf_url, _mediafire_html(slug, with_button)))
        if with_button:
            raw_link = f"https://download1472.mediafire.com/dl/{slug}.zip"

    golden_rows.append(
        dict(
            url=detail_url,
            download_url=download_url,
            image_url=image_srcset or "",
            tags=str(tags),
            raw_download_link=raw_link,
            extracted_text=extracted_record(
                download_url, image_srcset or "", str(tags), raw_link
            ),
        )
    )


def _pages_df(page_rows, rng, lang_minority) -> pd.DataFrame:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for idx, (url, html) in enumerate(page_rows):
        urls.append(url)
        tss.append(_BASE_TS + timedelta(seconds=idx))
        htmls.append(html.encode("utf-8"))
        texts.append(page_text(html))
        langs.append("de" if rng.random() < lang_minority else "en")
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_to_spark(spark, corpus: Corpus):
    # pandas input rides the Arrow createDataFrame path: batches are
    # converted driver-side and scanned JVM-side — no Python-worker
    # round-trips per scan (unlike list-of-tuples local relations)
    return spark.createDataFrame(corpus.pages, schema=PAGES_SCHEMA)


def seeds_to_spark(spark, corpus: Corpus):
    return spark.createDataFrame(corpus.seeds, schema="url string, seed_rank int")




# ---------------------------------------------------------------------------
# WET-scale synthetic document corpus (VERDICT r4 #7) — bench input for
# the text-cleaning stack at REALISTIC document lengths. The sf-suite's
# `documents` table has tiny synthetic bodies, so its sub-second
# timings say nothing about MB/s; this generator produces ~KB-sized
# documents ENTIRELY JVM-side (seeded xxhash64 picks from a word pool —
# no Python, no driver data, deterministic for any partitioning), so
# generating 100k docs is itself just a codegen stage.
#
# Statistical shape (deliberate):
# - sentences are hash-sampled WORD soup (not a sentence pool): two
#   unrelated documents share almost no word n-grams, so near-dup
#   candidate generation (minhash bands, repeated-n-gram tables) sees
#   realistic selectivity — a shared-sentence pool makes every doc
#   pair a near-dup candidate and turns any dedup bench quadratic;
# - ~1% of documents are byte-identical clones of their predecessor
#   (ids 0≡1, 100≡101, …): a realistic planted dup rate for minhash;
# - every document opens with the SAME boilerplate line: corpus-level
#   paragraph dedup has real work, exactly like web boilerplate;
# - stop words are over-represented in the pool (~25% density) and
#   every sentence ends with '.', so the Gopher quality gate and the
#   C4 line rules see typical English-like statistics.
# ---------------------------------------------------------------------------

_WET_STOPWORDS = ["the", "and", "of", "to", "that", "with", "have", "be",
                  "in", "on", "for", "as", "was", "its", "at", "by"]
_WET_CONTENT_WORDS = [
    "committee", "report", "regional", "water", "quality", "village",
    "institute", "coastal", "wetlands", "volunteers", "planted", "trees",
    "river", "museum", "public", "spring", "prices", "building",
    "materials", "quarter", "panel", "judges", "finalists", "entries",
    "library", "evening", "hours", "survey", "visitors", "engineers",
    "bridge", "design", "century", "flood", "records", "students",
    "schools", "robotics", "exhibition", "council", "funding",
    "neighborhood", "health", "clinics", "farmers", "valley", "harvest",
    "orchestra", "program", "october", "archaeologists", "pottery",
    "fragments", "airline", "routes", "cities", "northern", "region",
    "wind", "turbines", "island", "electricity", "bakery", "street",
    "operation", "analysts", "labor", "market", "winter", "footpath",
    "harbor", "district", "botanical", "gardens", "festival", "crowds",
    "rain", "officials", "residents", "conserve", "spell", "sensors",
    "soil", "moisture", "farms", "historians", "route", "trading",
    "road", "clinic", "children", "campaign", "night", "trains",
    "service", "mountain", "line", "editor", "essays", "contributors",
    "anthology", "solar", "panels", "school", "roof", "energy",
    "storm", "drain", "summer", "critics", "film", "script",
    "cinematography", "cooperative", "honey", "wool", "cheese",
    "weekend", "signage", "trail", "geology", "gorge", "observatory",
    "telescopes", "eclipse", "negotiators", "draft", "agreement",
    "session", "port", "container", "traffic", "august", "apprentices",
    "antique", "clocks", "workshop", "chapel", "commuters", "tram",
    "extension", "rangers", "cranes", "dawn", "frozen", "marsh",
    "publisher", "novel", "author", "ending", "shelter", "coldest",
    "week", "foundry", "bell", "medieval", "mold", "pattern", "grant",
    "cinema", "season", "archive", "stage", "glass", "tower", "copper",
]
#: stopwords repeated so the hash-uniform pick yields ~25% density
_WET_POOL = _WET_CONTENT_WORDS + _WET_STOPWORDS * 3
_WET_BOILER = ("Shared archive navigation header repeated on every page "
               "of this corpus.")


def synth_wet_corpus(spark, n_docs: int, min_paras: int = 4,
                     max_paras: int = 10, min_sents: int = 2,
                     max_sents: int = 5, min_words: int = 6,
                     max_words: int = 13, seed: int = 11):
    """→ (doc_id string, text string, html binary): ``n_docs``
    deterministic documents of ~1-4 KB. ``text`` is WET-shaped (one
    paragraph per line — the shape ``c4_clean``/``dedup_paragraphs``
    consume); ``html`` wraps the same paragraphs in <p> tags with a
    title/nav chrome (the ``html_to_text`` input shape). Every 20th
    document carries a planted email + IPv4 (``scrub_pii`` work);
    every 100th id PAIR is byte-identical (planted near-dup). Word
    picks are ``xxhash64(seed, cid, para, sent, word)`` indexes into
    the pool — same rows for any partitioning or doc count."""
    from pyspark.sql import functions as F

    pool = F.array(*[F.lit(w) for w in _WET_POOL])
    npool = len(_WET_POOL)
    # content id: doc 100k+1 clones doc 100k → byte-identical pair
    cid = F.when(
        F.pmod(F.col("id"), F.lit(100)) == 1, F.col("id") - 1
    ).otherwise(F.col("id"))

    def h(*cols):
        return F.xxhash64(F.lit(seed), cid, *cols)

    def rng(col, lo, hi):
        return F.pmod(col, F.lit(hi - lo + 1)) + lo

    def sentence(p, s):
        n_words = rng(h(p, s), min_words, max_words)
        words = F.transform(
            F.sequence(F.lit(1), n_words),
            lambda w: F.element_at(
                pool, (F.pmod(h(p, s, w), F.lit(npool)) + 1).cast("int")),
        )
        return F.concat(F.array_join(words, " "), F.lit("."))

    def para(p):
        n_sents = rng(h(p), min_sents, max_sents)
        return F.array_join(
            F.transform(F.sequence(F.lit(1), n_sents),
                        lambda s: sentence(p, s)),
            " ",
        )

    n_paras = rng(h(), min_paras, max_paras)
    paras = F.concat(
        F.array(F.lit(_WET_BOILER)),
        F.transform(F.sequence(F.lit(1), n_paras), para),
    )
    pii = F.concat(
        F.lit("Contact curator"), cid.cast("string"),
        F.lit("@example.com or 192.168.4."),
        F.pmod(cid, F.lit(250)).cast("string"),
        F.lit(" for the full archive."),
    )
    text = F.when(
        F.pmod(cid, F.lit(20)) == 0,
        F.array_join(F.concat(paras, F.array(pii)), "\n"),
    ).otherwise(F.array_join(paras, "\n"))

    html = F.encode(
        F.concat(
            F.lit("<html><head><title>Document "), F.col("doc_id"),
            F.lit("</title></head><body><nav>Home | Archive | About</nav>"),
            F.aggregate(
                F.split(F.col("text"), "\n"),
                F.lit(""),
                lambda acc, l: F.concat(acc, F.lit("<p>"), l, F.lit("</p>")),
            ),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    return (
        spark.range(n_docs)
        .select(
            F.format_string("d%08d", F.col("id")).alias("doc_id"),
            text.alias("text"),
            F.col("id"),
        )
        .withColumn("html", html)
        .drop("id")
    )
