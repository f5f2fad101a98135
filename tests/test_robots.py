"""robots.txt parser (RFC 9309 subset) → robots_gate rules: group
selection (exact agent beats *), same-agent group merging, empty
Disallow, Crawl-delay max, comments/unknown fields, and the parsed
rules driving the actual gate."""

from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.politeness import (
    parse_robots_txt,
    parse_robots_txt_text,
    robots_gate,
)

STAR = """
# comments everywhere
User-agent: *
Disallow: /private/   # trailing comment
Disallow: /tmp
Crawl-delay: 2
Sitemap: https://x.example.com/sitemap.xml
"""

EXACT_BEATS_STAR = """
User-agent: *
Disallow: /everything
User-agent: text2mc
Disallow: /only-this
Crawl-delay: 0.5
"""

STACKED_AND_MERGED = """
User-agent: a
User-agent: text2mc
Disallow: /a
User-agent: text2mc
Disallow: /b
Crawl-delay: 3
"""

ALLOW_ALL = """
User-agent: *
Disallow:
"""


def test_star_group_with_comments():
    prefixes, delay = parse_robots_txt_text(STAR, "text2mc")
    assert prefixes == ["/private/", "/tmp"]
    assert delay == 2000


def test_exact_agent_beats_star():
    prefixes, delay = parse_robots_txt_text(EXACT_BEATS_STAR, "text2mc")
    assert prefixes == ["/only-this"]
    assert delay == 500
    # another agent falls back to the * group
    assert parse_robots_txt_text(EXACT_BEATS_STAR, "otherbot") == (
        ["/everything"], None
    )


def test_stacked_agents_and_same_agent_groups_merge():
    prefixes, delay = parse_robots_txt_text(STACKED_AND_MERGED, "TEXT2MC")
    assert prefixes == ["/a", "/b"]  # case-insensitive agent match
    assert delay == 3000


def test_empty_disallow_is_unrestricted():
    assert parse_robots_txt_text(ALLOW_ALL, "text2mc") == ([], None)
    assert parse_robots_txt_text("", "text2mc") == ([], None)


def test_parsed_rules_drive_the_gate(spark):
    robots_txt = spark.createDataFrame(
        [("h0.example.com", STAR), ("h1.example.com", ALLOW_ALL)],
        "host string, robots_txt string",
    )
    rules = parse_robots_txt(robots_txt, user_agent="text2mc")
    got = {r.host: (list(r.disallow_prefixes), r.crawl_delay_ms)
           for r in rules.collect()}
    assert got["h0.example.com"] == (["/private/", "/tmp"], 2000)
    assert got["h1.example.com"] == ([], None)

    queued = spark.createDataFrame(
        [("https://h0.example.com/private/x", "h0.example.com"),
         ("https://h0.example.com/ok", "h0.example.com"),
         ("https://h1.example.com/private/x", "h1.example.com")],
        "url string, host string",
    )
    allowed, denied = robots_gate(queued, rules)
    assert {r.url for r in denied.collect()} == {"https://h0.example.com/private/x"}
    assert allowed.count() == 2
