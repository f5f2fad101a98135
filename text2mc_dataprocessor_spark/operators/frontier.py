"""Frontier table schema + window-ranked priority dequeue.

The reference's frontier is the row order of projects.csv: state is the
NULL-pattern of columns and dequeue order is the row index
(/root/reference/scraper/selenium_scraper.py:196-218, 286-311). Here the
frontier is an explicit table and dequeue is a window:

    row_number() OVER (PARTITION BY host
                       ORDER BY score DESC, depth ASC, discovered_seq ASC)
        <= politeness_budget

The reference's strictly-sequential crawl is the degenerate case
(single seed + global budget 1) — asserted against the pure-Python
oracle in tests/test_crawl_order.py.

Scale notes: the window shuffles only by ``host``; a single hot host
does NOT serialize later stages because the *fetch/extract* stage is
repartitioned on a salted key afterwards (see plans/crawl.py). Ordering
NEVER relies on physical row order — ``discovered_seq`` is an explicit
total-order column (SURVEY §4 'crawl ordering determinism').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FRONTIER_SCHEMA = (
    "url string, host string, url_hash long, bucket int, kind string, "
    "depth int, score double, state string, discovered_seq long, "
    "round int, parent_url string"
)

def kind_score_expr():
    return (
        F.when(F.col("kind") == "listing", F.lit(2.0))
        .when(F.col("kind") == "detail", F.lit(1.0))
        .otherwise(F.lit(0.0))
    )


def priority_order():
    return [
        F.col("score").desc(),
        F.col("depth").asc(),
        F.col("discovered_seq").asc(),
    ]


def dequeue(queued: DataFrame, politeness_budget: int,
            global_budget: int | None = None) -> DataFrame:
    """Top-k QUEUED rows per host (k = politeness budget), plus a
    ``dequeue_rank`` giving the deterministic within-round order.

    The global rank is a single-partition window, but it runs on the
    already-budgeted set (≤ hosts × budget rows — the round's work
    unit), not the frontier.
    """
    per_host = Window.partitionBy("host").orderBy(*priority_order())
    picked = (
        queued.withColumn("host_rank", F.row_number().over(per_host))
        .filter(F.col("host_rank") <= politeness_budget)
        .drop("host_rank")
    )
    global_w = Window.orderBy(*priority_order())
    picked = picked.withColumn("dequeue_rank", F.row_number().over(global_w))
    if global_budget is not None:
        picked = picked.filter(F.col("dequeue_rank") <= global_budget)
    return picked
