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
    return spark.createDataFrame(corpus.pages, schema=PAGES_SCHEMA)


def seeds_to_spark(spark, corpus: Corpus):
    return spark.createDataFrame(corpus.seeds, schema="url string, seed_rank int")


# ---------------------------------------------------------------------------
# WET-scale synthetic document corpus (VERDICT r4 #7) — bench input for
# the text-cleaning stack at REALISTIC document lengths. The sf-suite's
# `documents` table has tiny synthetic bodies, so its sub-second
# timings say nothing about MB/s; this generator produces ~KB-sized
# documents ENTIRELY JVM-side (seeded xxhash64 picks from a sentence
# pool — no Python, no driver data, deterministic for any n_docs), so
# generating 100k docs is itself just a codegen stage.
# ---------------------------------------------------------------------------

_WET_SENTENCES = [
    "The committee published its annual report on regional water quality late on Tuesday.",
    "Researchers at the institute have spent three years mapping the coastal wetlands.",
    "Local volunteers planted more than two thousand trees along the river bank.",
    "The museum's new wing will open to the public early next spring.",
    "Prices for basic building materials rose sharply during the second quarter.",
    "A panel of judges selected twelve finalists from nearly four hundred entries.",
    "The library extended its evening hours after a survey of frequent visitors.",
    "Engineers tested the bridge design against a century of flood records.",
    "Students from three schools collaborated on the robotics exhibition.",
    "The city council approved funding for two new neighborhood health clinics.",
    "Farmers in the valley reported an unusually early harvest this year.",
    "The orchestra will perform a program of twentieth century works in October.",
    "Archaeologists uncovered pottery fragments dating back over a thousand years.",
    "The airline added direct routes to four cities across the northern region.",
    "Wind turbines now supply roughly a fifth of the island's electricity.",
    "The bakery on Mill Street celebrated fifty years of continuous operation.",
    "Analysts expect the labor market to cool gradually through the winter.",
    "A new footpath connects the harbor district with the botanical gardens.",
    "The festival drew record crowds despite intermittent rain on both days.",
    "Officials urged residents to conserve water during the prolonged dry spell.",
    "The startup's sensors track soil moisture across hundreds of small farms.",
    "Historians disagree about the precise route of the old trading road.",
    "The clinic vaccinated more than nine hundred children during the campaign.",
    "Night trains will resume service on the mountain line next month.",
    "The editor assembled essays from twenty contributors for the anthology.",
    "Solar panels on the school roof cut its energy bill nearly in half.",
    "The team mapped every storm drain in the district over one summer.",
    "Critics praised the film's restrained script and patient cinematography.",
    "The cooperative sells honey, wool, and cheese at the weekend market.",
    "New signage along the trail explains the geology of the gorge.",
    "The observatory opened its telescopes to the public for the eclipse.",
    "Negotiators reached a draft agreement after a final overnight session.",
    "The port handled a record volume of container traffic in August.",
    "Apprentices restore antique clocks in the workshop behind the chapel.",
    "The survey found that most commuters favor the proposed tram extension.",
    "Rangers counted wintering cranes at dawn across the frozen marsh.",
    "The publisher reissued the novel with the author's original ending.",
    "Volunteers staffed the warming shelter through the coldest week on record.",
    "The foundry cast the replacement bell using the medieval mold pattern.",
    "A modest grant kept the village cinema open for another season.",
]


def synth_wet_corpus(spark, n_docs: int, min_paras: int = 4,
                     max_paras: int = 10, min_sents: int = 2,
                     max_sents: int = 6, seed: int = 11):
    """→ (doc_id string, text string, html binary): ``n_docs``
    deterministic documents of ~1-4 KB. ``text`` is WET-shaped (one
    paragraph per line — the shape ``c4_clean``/``dedup_paragraphs``
    consume); ``html`` wraps the same paragraphs in <p> tags with a
    title/nav chrome (the ``html_to_text`` input shape). Every 20th
    document carries a planted email + IPv4 so ``scrub_pii`` has
    non-zero work. Sentence picks are ``xxhash64(seed, id, para,
    sent)`` indexes into the pool — same rows for any partitioning."""
    from pyspark.sql import functions as F

    pool = F.array(*[F.lit(s) for s in _WET_SENTENCES])
    npool = len(_WET_SENTENCES)
    doc = F.col("id")

    def pick(p, s):
        return F.element_at(
            pool,
            (F.pmod(F.xxhash64(F.lit(seed), doc, p, s), F.lit(npool)) + 1
             ).cast("int"),
        )

    def para(p):
        n_sents = (
            F.pmod(F.xxhash64(F.lit(seed), doc, p), F.lit(max_sents - min_sents + 1))
            + min_sents
        )
        return F.array_join(
            F.transform(F.sequence(F.lit(1), n_sents), lambda s: pick(p, s)),
            " ",
        )

    n_paras = (
        F.pmod(F.xxhash64(F.lit(seed), doc), F.lit(max_paras - min_paras + 1))
        + min_paras
    )
    paras = F.transform(F.sequence(F.lit(1), n_paras), para)
    pii = F.concat(
        F.lit("Contact curator"), doc.cast("string"),
        F.lit("@example.com or 192.168.4."),
        F.pmod(doc, F.lit(250)).cast("string"),
        F.lit(" for the full archive."),
    )
    text = F.when(
        F.pmod(doc, F.lit(20)) == 0,
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
            F.format_string("d%08d", doc).alias("doc_id"),
            text.alias("text"),
        )
        .withColumn("html", html)
    )
