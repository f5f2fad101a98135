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


ROBOTS_RULES_SCHEMA = (
    "host string, disallow_prefixes array<string>, crawl_delay_ms long"
)


def parse_robots_txt_text(text: str, user_agent: str = "*") -> tuple[list[str], int | None]:
    """One robots.txt body → (disallow_prefixes, crawl_delay_ms) for
    ``user_agent``, per the Robots Exclusion Protocol (RFC 9309, the
    subset ``robots_gate`` consumes):

    - a group = consecutive ``User-agent`` lines followed by rules;
      groups naming the same agent merge;
    - an exact (case-insensitive) agent match beats the ``*`` group —
      never both;
    - empty ``Disallow:`` means unrestricted (no prefix recorded);
    - ``Crawl-delay`` seconds → ms (max across the chosen groups);
    - ``#`` comments and unknown fields (Allow, Sitemap, …) ignored —
      the gate is prefix-deny only, so Allow-precedence is out of scope
      (documented; a denied-by-prefix URL with a longer Allow match
      would be over-blocked, the conservative direction).
    """
    ua = user_agent.lower()
    groups: list[tuple[set[str], list[str], float | None]] = []
    cur_agents: set[str] | None = None
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur_agents is None or in_rules:
                cur_agents = set()
                groups.append((cur_agents, [], None))
                in_rules = False
            cur_agents.add(value.lower())
        elif cur_agents is not None:
            in_rules = True
            agents, dis, delay = groups[-1]
            if field == "disallow" and value:
                dis.append(value)
            elif field == "crawl-delay":
                try:
                    d = float(value)
                except ValueError:
                    continue
                groups[-1] = (agents, dis, max(delay, d) if delay is not None else d)
    exact = [g for g in groups if ua in g[0]]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    prefixes: list[str] = []
    delay_ms: int | None = None
    for _, dis, delay in chosen:
        prefixes.extend(dis)
        if delay is not None:
            delay_ms = max(delay_ms or 0, int(delay * 1000))
    return prefixes, delay_ms


def parse_robots_txt(df: DataFrame, text_col: str = "robots_txt",
                     user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) → the ``robots_gate`` rules shape
    ``(host, disallow_prefixes, crawl_delay_ms)``. Arrow-batched
    mapInPandas — robots bodies are tiny and per-host, so this runs
    once per host at frontier-admission time, never per URL."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for host, text in zip(pdf["host"], pdf[text_col]):
                prefixes, delay = parse_robots_txt_text(text or "", user_agent)
                rows.append((host, prefixes, delay))
            yield pd.DataFrame(
                rows, columns=["host", "disallow_prefixes", "crawl_delay_ms"]
            )

    return df.select("host", text_col).mapInPandas(run, ROBOTS_RULES_SCHEMA)


def crawl_delay_budgets(robots: DataFrame, round_index: int,
                        round_interval_ms: int | None,
                        politeness_budget: int) -> DataFrame:
    """Robots ``Crawl-delay`` → this round's per-host dequeue budgets
    ``(host, host_budget)`` for ``dequeue(host_budgets=…)``.

    Token-bucket by round, stateless and deterministic: a crawl round
    models ``round_interval_ms`` of wall time, so host h with delay D
    may be fetched ``interval/D`` times per round on average. The
    per-round grant is the integer increment of the cumulative
    entitlement::

        tokens(r) = floor((r+1)·I/D) − floor(r·I/D)

    which sums to exactly ``floor(R·I/D)`` over any R rounds — a host
    with D > I gets one fetch every ``ceil(D/I)`` rounds (0-token
    "wait" rounds in between), a host with D ≤ I gets ``~I/D`` per
    round, always capped at ``politeness_budget``. No per-host timer
    state: the round index IS the clock, so the schedule survives
    resume (``round_number()`` is persisted) and replays identically.

    Only hosts with a positive ``crawl_delay_ms`` emit a row — absent
    hosts default to ``politeness_budget`` in the dequeue join. The
    result is a tiny per-round dimension (|hosts| rows, broadcast)."""
    if round_interval_ms is None:
        # disabled (the CrawlConfig default): an empty dimension —
        # every host falls back to the default politeness_budget in
        # the dequeue join, same as not publishing a Crawl-delay.
        return robots.limit(0).select(
            "host", F.lit(politeness_budget).cast("int").alias("host_budget"))
    if round_interval_ms <= 0:
        # interval 0 grants 0 tokens to every delayed host forever —
        # combined with the engine's wait-round rule that livelocks
        # run(rounds=None). None (disabled) is the way to opt out.
        raise ValueError(
            "round_interval_ms must be > 0 (use None to disable "
            "crawl-delay budgeting)")
    r = F.lit(round_index).cast("long")
    i = F.lit(round_interval_ms).cast("long")
    d = F.col("crawl_delay_ms").cast("long")
    tokens = F.floor((r + 1) * i / d) - F.floor(r * i / d)
    return (
        robots.filter(F.col("crawl_delay_ms") > 0)
        .select(
            "host",
            F.least(tokens, F.lit(politeness_budget)).cast("int").alias("host_budget"),
        )
    )


def salt_fetch_partitions(df: DataFrame, n_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Spread a host-skewed fetch batch: repartition by (host, salt)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
    )
    return salted.repartition(n_partitions, F.col("host"), F.col("_salt")).drop("_salt")
