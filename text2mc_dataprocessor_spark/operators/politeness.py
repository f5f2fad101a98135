"""Robots gate + fetch-stage skew salting.

The reference is implicitly polite (one browser, one fetch at a time —
/root/reference/scraper/selenium_scraper.py:120) and has no robots
handling. The engine makes both explicit:

- ``robots_gate`` — broadcast-join the small robots dimension
  ``(host, disallow_prefixes array<string>)`` and split QUEUED rows into
  allowed / denied via a JVM-side ``exists(prefixes, p -> startswith)``.
- ``salt_fetch_partitions`` — after the per-host budgeted dequeue, the
  fetch/extract stage is repartitioned on ``(host, pmod(url_hash, S))``
  so one dominant host's batch spreads over S tasks while the budget
  was still enforced on the UNSALTED host (SURVEY §4 skew row; the
  north rule names this explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_gate(queued: DataFrame, robots: DataFrame | None) -> tuple[DataFrame, DataFrame]:
    """→ (allowed, denied). robots: (host, disallow_prefixes)."""
    if robots is None:
        return queued, queued.limit(0)
    rules = robots.select("host", "disallow_prefixes")
    joined = queued.join(F.broadcast(rules), "host", "left")
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    denied_pred = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists("disallow_prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    flagged = joined.withColumn("_denied", denied_pred).drop("disallow_prefixes")
    allowed = flagged.filter(~F.col("_denied")).drop("_denied")
    denied = flagged.filter(F.col("_denied")).drop("_denied")
    return allowed, denied


def salt_fetch_partitions(df: DataFrame, n_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Spread a host-skewed fetch batch: repartition by (host, salt)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
    )
    return salted.repartition(n_partitions, F.col("host"), F.col("_salt")).drop("_salt")
