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


def with_global_rank(df: DataFrame, order_exprs: list, out: str = "rank",
                     n_partitions: int | None = None,
                     info: dict | None = None,
                     persist_input: bool = False) -> DataFrame:
    """Distributed total rank 1..n by ``order_exprs`` (which must end in
    a unique tie-breaker).

    Two-phase: range-partition on the key (globally ordered partitions),
    rank within each partition, then add per-partition offsets computed
    from a tiny count collect. No single-partition window — the sort is
    P-way parallel, which is what keeps ordering determinism affordable
    on a 10^10-row frontier (SURVEY §4 'crawl ordering determinism').

    ``info`` (optional dict) is filled with ``{"n": <total row count>,
    "persisted": [<cached intermediate>]}`` — the count is a free
    byproduct of the offsets collect, so callers never need a separate
    ``.count()`` job, and the caller owns unpersisting the intermediate
    (it backs every consumer of the ranked output).

    Without ``info`` the caller has no handle to release, so the ranked
    output is materialized (``localCheckpoint``) and every internal
    cache is unpersisted before returning — one-shot callers (driver
    queries, top-k helpers) would otherwise leak a cached DataFrame per
    invocation for the session lifetime. The cache is only load-bearing
    between the offsets collect and the final materialization: the
    range partitioner SAMPLES, so a recompute could draw different
    partition bounds than the counts were taken from."""
    release = info is None
    if release:
        info = {}
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if persist_input:
        # repartitionByRange's partitioner SAMPLES its input in a
        # separate pass — without a persist the upstream plan (e.g. the
        # per-host budget window over the whole frontier) runs twice
        df = df.persist()
        info.setdefault("persisted", []).append(df)
    part = df.repartitionByRange(n_partitions, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    part = part.persist()  # the offsets collect + ranked output share one pass
    counts = {
        r._pid: r.n
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    info["n"] = acc
    info.setdefault("persisted", []).append(part)
    if offsets:
        offset_expr = F.element_at(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            ),
            F.col("_pid"),
        )
    else:
        offset_expr = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    ranked = (
        part.withColumn(out, (F.row_number().over(w) + offset_expr).cast("long"))
        .drop("_pid")
    )
    if release:
        ranked = ranked.localCheckpoint(eager=True)
        for c in info.get("persisted", []):
            c.unpersist()
    return ranked


def with_grouped_rank(df: DataFrame, group_expr, order_exprs: list,
                      out: str = "rank", info: dict | None = None) -> DataFrame:
    """Distributed total rank 1..n when an ORDER-RESPECTING group id is
    available: ``group_expr`` must map every row to an integer group
    such that all rows of a lower group sort strictly before any row of
    a higher group under the global order (and ``order_exprs`` orders
    rows within a group, ending in a unique tie-breaker).

    One counts-collect job computes per-group offsets; ranking is then
    ``offset[group] + row_number() OVER (PARTITION BY group)``. Unlike
    ``with_global_rank`` there is NO range-partitioner sampling pass —
    the group id replaces sampled range bounds — so the input is
    traversed exactly once. ``info`` receives ``{"n": total}``.
    """
    g = df.withColumn("_grp", group_expr.cast("long"))
    counts = {
        r._grp: r.n
        for r in g.groupBy("_grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    if info is not None:
        info["n"] = acc
    if offsets:
        offset_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_grp"),
        )
    else:
        offset_expr = F.lit(0)
    w = Window.partitionBy("_grp").orderBy(*order_exprs)
    return (
        g.withColumn(out, (F.row_number().over(w) + offset_expr).cast("long"))
        .drop("_grp")
    )


def dequeue_group_expr(max_seq: int, n_groups: int = 256):
    """Order-respecting group id for the dequeue priority order
    (score DESC, depth ASC, discovered_seq ASC), given the current
    frontier's max discovered_seq.

    CONTRACT: scores must be INTEGRAL (the engine's fixed kind scores
    listing 2.0 / detail 1.0 / download 0.0 are) — ``(2 - score)``
    truncates, so a frontier carrying custom fractional scores would
    interleave score classes across groups and break the
    order-respecting invariant; such frontiers must take the sampled
    ``with_global_rank`` path instead (``dequeue(..., max_seq=None)``).
    ``(srank, depth)`` major-orders the groups and a discovered_seq
    range bucket subdivides the big same-(score,depth) groups for
    parallelism. Depth is clamped at 4095: all deeper rows share the
    tail group of their score class, with NO seq subdivision there
    (rows of different depths share that group, and within-group order
    is still exact via ``priority_order()``) — merging tail groups
    keeps monotonicity, it only costs parallelism. Group balance only
    affects parallelism, never correctness."""
    srank = (F.lit(2.0) - F.col("score")).cast("long")
    depth_c = F.least(F.col("depth"), F.lit(4095))
    seq_bucket = F.floor(
        F.col("discovered_seq") * n_groups / F.lit(max(max_seq, 0) + 1)
    )
    seq_bucket = F.least(F.greatest(seq_bucket, F.lit(0)), F.lit(n_groups - 1))
    # depth ≥ 4095 collapses into one group per score class: a seq
    # bucket there would order (depth 4095, high seq) after
    # (depth 5000, low seq), violating depth-major priority
    seq_bucket = F.when(F.col("depth") >= 4095, F.lit(0)).otherwise(seq_bucket)
    return (srank * 4096 + depth_c) * n_groups + seq_bucket


def stable_dequeue_group_expr(seq_block: int = 4096):
    """Order-respecting group id for the dequeue priority order that is
    STABLE ACROSS ROUNDS (unlike ``dequeue_group_expr``, whose seq
    buckets renormalize by the frontier's current max_seq): the
    discovered_seq dimension is blocked into fixed-width ranges, so a
    row's group never changes as the frontier grows. That makes
    per-group row counts incrementally maintainable in round state —
    the basis of the prefix-pruned dequeue. Same integral-score /
    depth-clamp contract as ``dequeue_group_expr``."""
    srank = (F.lit(2.0) - F.col("score")).cast("long")
    depth_c = F.least(F.col("depth"), F.lit(4095))
    blk = F.least(
        F.floor(F.col("discovered_seq") / F.lit(seq_block)),
        F.lit((1 << 34) - 1),
    )
    blk = F.when(F.col("depth") >= 4095, F.lit(0)).otherwise(blk)
    return (srank * 4096 + depth_c) * F.lit(1 << 34) + blk


def grouped_counts(df: DataFrame, group_expr) -> dict[int, int]:
    """{group id: row count} — one narrow map-side-combined job."""
    return {
        int(r._g): int(r.n)
        for r in df.groupBy(group_expr.cast("long").alias("_g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def dequeue_pruned(queued: DataFrame, politeness_budget: int,
                   global_budget: int, grp_counts: dict[int, int],
                   info: dict | None = None, seq_block: int = 4096,
                   host_budgets: DataFrame | None = None) -> DataFrame:
    """``dequeue`` for the global-budget regime without scanning,
    shuffling or window-sorting the whole queue: read only a PREFIX of
    the priority-ordered groups that provably contains every winner.

    Soundness: groups are order-respecting, so every row outside the
    prefix sorts strictly after every row inside it; and a row's
    within-host rank is decided only by better-priority same-host rows,
    which live in lower-or-equal groups — hence inside the prefix too.
    So if the per-host-capped prefix yields ≥ global_budget rows, the
    true top-global_budget set is entirely inside the prefix. The
    argument only needs the per-host cap to be a function of the host,
    so ``host_budgets`` overrides (see ``dequeue``) preserve soundness
    unchanged. If it
    yields fewer (hot hosts concentrated the prefix), the prefix is
    extended and re-run — the loop ends at the full queue, which is the
    plain ``dequeue``. Per-group counts come from ``grp_counts``,
    maintained incrementally by the crawl loop (no count scan per
    round).

    WITHOUT a global budget, every host must be served its top-k, and
    any host's rows may all live in the last group — a full pass is
    semantically required; callers use ``dequeue`` there.
    """
    groups = sorted(g for g, n in grp_counts.items() if n > 0)
    expr = stable_dequeue_group_expr(seq_block)
    target = global_budget
    while True:
        cum, prefix_max = 0, None
        for g in groups:
            prefix_max = g
            cum += grp_counts[g]
            if cum >= target:
                break
        whole = prefix_max is None or prefix_max >= (groups[-1] if groups else 0)
        # Once the prefix covers every KNOWN group, filter nothing: the
        # full dequeue costs the same at that point, and it makes stale
        # grp_counts (a future queue-mutation path that forgets to update
        # them) a pure performance bug, never a correctness one — rows in
        # groups the counts have never heard of still get dequeued.
        sub = queued if whole else queued.filter(expr <= F.lit(prefix_max))
        sub_info: dict = {}
        picked = dequeue(
            sub, politeness_budget, None, info=sub_info,
            max_seq=(1 << 34) * seq_block,  # any bound ≥ max seq works for
            # the rank's OWN grouping; pass the stable expr's domain top
            host_budgets=host_budgets,
        )
        if sub_info["n"] >= global_budget or whole:
            if info is not None:
                info.update(sub_info)
                info["n"] = min(sub_info["n"], global_budget)
                info["prefix_max_group"] = prefix_max
                info["prefix_rows"] = cum
            return picked.filter(F.col("dequeue_rank") <= global_budget)
        # Capped prefix too small: widen proportionally to the observed
        # yield and retry. Yield-proportional (not a fixed ×4) matters
        # for the prune factor — a prefix that misses the budget by a few
        # percent (rows filtered upstream by robots, or per-host caps
        # shaving the tail) should widen by those few percent + slack, not
        # quadruple; a hot-host-dominated prefix (yield ≈ politeness
        # budget) still jumps in proportion to its shortfall. target
        # strictly grows, so the loop is bounded by the whole queue.
        yield_n = max(sub_info["n"], 1)
        for df in sub_info.get("persisted", []):
            df.unpersist()
        target = max(
            int(target * global_budget * 1.15 / yield_n) + 1,
            cum + 1,
            target + 1,
        )


def dequeue(queued: DataFrame, politeness_budget: int,
            global_budget: int | None = None,
            info: dict | None = None,
            max_seq: int | None = None,
            host_budgets: DataFrame | None = None) -> DataFrame:
    """Top-k QUEUED rows per host (k = politeness budget), plus a
    ``dequeue_rank`` giving the deterministic within-round order
    (distributed rank — no single-partition window).

    ``host_budgets`` (optional, ``(host, host_budget int)``) overrides
    the uniform k per host — the crawl-delay path: hosts absent from it
    keep ``politeness_budget``; a 0 budget dequeues nothing from that
    host this round (its rows stay queued). A small broadcast dimension
    (|hosts| ≪ |urls|) joined before the per-host window, so the big
    side still shuffles once, on ``host``.

    ``info`` (optional) receives the exact dequeued count and any cached
    intermediate, piggybacked on the rank's offsets collect — the crawl
    loop's termination check costs no extra Spark job. With ``max_seq``
    the rank uses order-respecting (score, depth, seq-bucket) groups
    (``with_grouped_rank`` — single pass, no sampling); without it the
    generic sampled range rank runs."""
    per_host = Window.partitionBy("host").orderBy(*priority_order())
    if host_budgets is not None:
        cap = F.coalesce(F.col("host_budget"), F.lit(politeness_budget))
        queued = queued.join(
            F.broadcast(host_budgets.select("host", "host_budget")),
            "host", "left",
        )
    else:
        cap = F.lit(politeness_budget)
    picked = (
        queued.withColumn("host_rank", F.row_number().over(per_host))
        .filter(F.col("host_rank") <= cap)
        .drop("host_rank", *(["host_budget"] if host_budgets is not None else []))
    )
    if max_seq is not None:
        if info is not None:
            picked = picked.persist()
            info.setdefault("persisted", []).append(picked)
        picked = with_grouped_rank(
            picked, dequeue_group_expr(max_seq), priority_order(),
            out="dequeue_rank", info=info,
        )
    else:
        picked = with_global_rank(picked, priority_order(), out="dequeue_rank",
                                  info=info, persist_input=info is not None)
    if global_budget is not None:
        picked = picked.filter(F.col("dequeue_rank") <= global_budget)
        if info is not None:
            # dequeue_rank is dense 1..n, so the budget cap is exact
            info["n"] = min(info["n"], global_budget)
    return picked
