"""Round-0 politeness bootstrap — LIVE-crawled robots + sitemaps.

The crawl engine consumes a robots rules dimension (``robots_gate``)
and a seed list; until now callers constructed the rules table by
hand. This plan derives both from fetched bodies, through the same
fetch surface the crawl itself uses (any object with
``.fetch(df_with_url) -> url, html[, error]`` — ``HttpFetcher`` in
production, ``TableFetcher`` in tests)::

    seeds ─▶ distinct origins ─▶ GET /robots.txt  ─▶ parse_robots_txt ─▶ rules
                        └──────▶ GET /sitemap.xml ─▶ sitemap_entries ─┬▶ page seeds
                                   ▲                                  │
                                   └── child sitemaps (≤ max_depth) ──┘

The reference scraper has neither robots nor sitemap handling (it is
implicitly polite: one sequential browser,
/root/reference/scraper/selenium_scraper.py:120) — this is the
engine-side surface the north rule adds.

Scale shape: everything here is per-HOST, not per-URL. The probe set
is the distinct-origin dimension (|hosts| rows — a few million at
Common-Crawl scale, trivially partitionable), fetched inside the
fetcher's own ``mapInPandas`` and parsed with Arrow-batched /
pure-JVM functions. No URL lists ever reach the driver; the only
driver-side control flow is the bounded sitemap-index recursion
(``max_sitemap_depth`` iterations over a shrinking child-sitemap
frontier, one emptiness probe per level).

Failure semantics (X4 per-row isolation): a host whose robots.txt
fetch fails or returns non-robots bytes yields NO rules — allow-all,
matching RFC 9309 §2.3.1 (unreachable robots.txt on a 4xx ⇒
unrestricted). A failed or malformed sitemap yields no seeds;
sitemaps are advisory input, not state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sitemap import sitemap_entries
from ..operators.politeness import parse_robots_txt


def seed_origins(seeds: DataFrame, url_col: str = "url") -> DataFrame:
    """Distinct ``(origin, host)`` from a seed URL list.

    ``origin`` = ``scheme://authority`` (authority KEEPS the port so
    probe URLs stay fetchable); ``host`` is the engine's frontier key
    (``host_col`` — lower-cased, port-stripped), so the rules this
    bootstrap emits join the frontier on exactly the key
    ``robots_gate`` uses. Two origins sharing a host (http+https, or
    same host on two ports) are each probed; ``bootstrap_politeness``
    merges their parses into ONE rules row per host (union of
    disallow prefixes, max crawl-delay — the conservative direction),
    because a duplicate-host rules dimension would fan out every
    queued row of that host through ``robots_gate``'s join."""
    u = F.col(url_col)
    # try_parse_url: a malformed seed yields NULL (filtered) instead of
    # failing the whole stage under ANSI mode
    return (
        seeds.select(
            F.concat(
                F.lower(F.try_parse_url(u, F.lit("PROTOCOL"))),
                F.lit("://"),
                F.lower(F.try_parse_url(u, F.lit("AUTHORITY"))),
            ).alias("origin"),
            F.lower(F.try_parse_url(u, F.lit("HOST"))).alias("host"),
        )
        .filter(F.col("origin").isNotNull() & F.col("host").isNotNull())
        .distinct()
    )


def _fetched_ok(fetched: DataFrame) -> DataFrame:
    """Normalize a fetcher's output to successful (url, html) rows.
    ``HttpFetcher`` emits an ``error`` column (X4 rows, html NULL);
    ``TableFetcher`` inner-joins so misses are simply absent."""
    if "error" in fetched.columns:
        fetched = fetched.filter(F.col("error").isNull())
    return fetched.select("url", "html").filter(F.col("html").isNotNull())


def bootstrap_politeness(
    seeds: DataFrame,
    fetcher,
    user_agent: str = "*",
    max_sitemap_depth: int = 2,
    sitemap_path: str = "/sitemap.xml",
) -> tuple[DataFrame, DataFrame]:
    """→ ``(robots_rules, sitemap_seeds)`` for a seed URL list.

    ``robots_rules`` is the ``robots_gate`` dimension ``(host,
    disallow_prefixes, crawl_delay_ms)``, restricted to hosts that
    actually publish a restriction (empty-rule hosts are dropped so
    the broadcast dimension stays minimal — absent hosts are
    allow-all / default-budget in every consumer).

    ``sitemap_seeds`` is one column ``url``: the ``<urlset>`` page
    entries of every origin's ``sitemap_path``, with ``<sitemapindex>``
    children followed up to ``max_sitemap_depth`` levels. Pass them to
    ``CrawlEngine.init`` unioned with the caller's seeds — they enter
    the frontier as listing-kind seeds (the engine's seed semantic)
    and the seen-set dedups any overlap. Cross-host ``<loc>`` entries
    are admitted like any discovered link.

    Wire the result into a crawl::

        robots, extra = bootstrap_politeness(seeds, fetcher)
        eng = CrawlEngine(spark, workdir, pages, robots=robots,
                          fetch_fn=fetcher.as_fetch_fn())
        eng.init(seeds.union(extra))
    """
    origins = seed_origins(seeds)

    robots_probe = origins.select(
        "host", F.concat("origin", F.lit("/robots.txt")).alias("url")
    )
    # make_valid_utf8(cast(...)), not decode(): under this repo's ANSI
    # default decode() throws MALFORMED_CHARACTER_CODING on one
    # non-UTF-8 body and aborts the whole bootstrap; the cast keeps the
    # raw bytes (which would then fail Arrow wrapping on the
    # JVM→Python hop into parse_robots_txt) and make_valid_utf8
    # substitutes U+FFFD so a garbage robots.txt parses to zero rules
    # (allow-all, RFC 9309 §2.3.1) while every other host is
    # unaffected. localCheckpoint materializes the live GETs ONCE —
    # the returned frames are lazy, and without it every downstream
    # action (robots_gate each round, each sitemap level's isEmpty)
    # would re-fetch every origin.
    bodies = robots_probe.join(
        _fetched_ok(fetcher.fetch(robots_probe)), "url", "left"
    ).select(
        "host",
        F.coalesce(
            F.make_valid_utf8(F.col("html").cast("string")), F.lit("")
        ).alias("robots_txt"),
    ).localCheckpoint(eager=True)
    # one rules row PER HOST: a host probed through several origins
    # (http+https, ports) merges conservatively — union of prefixes,
    # max delay. parse_robots_txt is row-per-row; without this groupBy
    # a duplicate host key would fan out the robots_gate join.
    robots = (
        parse_robots_txt(bodies, user_agent=user_agent)
        .groupBy("host")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("disallow_prefixes")))
            ).alias("disallow_prefixes"),
            F.max("crawl_delay_ms").alias("crawl_delay_ms"),
        )
        .filter(
            (F.size("disallow_prefixes") > 0)
            | F.col("crawl_delay_ms").isNotNull()
        )
        # robots_gate + crawl_delay_budgets re-read this dimension
        # every round; sever it once so they replay |hosts| rows, not
        # the parse (bodies above already pin the fetch).
        .localCheckpoint(eager=True)
    )

    sm_frontier = origins.select(
        "host", F.concat("origin", F.lit(sitemap_path)).alias("url")
    )
    page_seeds: DataFrame | None = None
    probed = sm_frontier.select("url")
    for _ in range(max_sitemap_depth):
        if sm_frontier.isEmpty():
            break
        # same cast-not-decode and one-GET-per-level materialization
        # as the robots bodies above: entries feeds BOTH page_seeds
        # and the next-level frontier, and the next iteration's
        # isEmpty() would otherwise replay every earlier level's GETs.
        xml = sm_frontier.join(
            _fetched_ok(fetcher.fetch(sm_frontier)), "url", "inner"
        ).select(
            "host",
            F.make_valid_utf8(F.col("html").cast("string")).alias("xml"),
        ).localCheckpoint(eager=True)
        entries = sitemap_entries(xml, keep_cols=("host",))
        urls = entries.filter(F.col("kind") == "url").select(
            F.col("loc").alias("url")
        )
        page_seeds = urls if page_seeds is None else page_seeds.union(urls)
        # next level: child sitemaps not probed at ANY earlier level
        # (a sitemapindex cycle A→B→A must not re-fetch A)
        sm_frontier = (
            entries.filter(F.col("kind") == "sitemap")
            .select("host", F.col("loc").alias("url"))
            .join(probed, "url", "left_anti")
            .distinct()
        )
        probed = probed.union(sm_frontier.select("url"))
    if page_seeds is None:
        page_seeds = seeds.select("url").limit(0)
    return robots, page_seeds.distinct()
