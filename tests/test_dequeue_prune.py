"""Prefix-pruned dequeue (global-budget regime): must return EXACTLY
the plain dequeue's rows and ranks while reading only a bounded prefix
of the priority-ordered groups."""

import pandas as pd
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.frontier import (
    dequeue,
    dequeue_pruned,
    grouped_counts,
    stable_dequeue_group_expr,
)


def _queue(spark, n=20_000, hosts=50):
    d = F.col("id")
    return spark.range(n).select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        F.concat(F.lit("h"), (d % hosts).cast("string")).alias("host"),
        # three score classes and growing depth, like a real frontier
        F.when(d % 7 == 0, F.lit(2.0)).when(d % 3 == 0, F.lit(1.0))
        .otherwise(F.lit(0.0)).alias("score"),
        (d % 5).cast("int").alias("depth"),
        d.alias("discovered_seq"),
    )


def _cmp(a, b):
    cols = ["url", "dequeue_rank"]
    pa = a.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    pb = b.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)


def test_pruned_matches_plain_and_scans_prefix_only(spark):
    q = _queue(spark).cache()
    counts = grouped_counts(q, stable_dequeue_group_expr())
    total = sum(counts.values())
    info: dict = {}
    pruned = dequeue_pruned(q, politeness_budget=3, global_budget=40,
                            grp_counts=counts, info=info)
    plain = dequeue(q, politeness_budget=3, global_budget=40, max_seq=total)
    _cmp(pruned, plain)
    # the scan was actually pruned: the prefix holds a small fraction
    assert info["prefix_rows"] < total * 0.2, (info["prefix_rows"], total)
    assert info["n"] == 40
    # and the physical plan applies the group-prefix filter BENEATH the
    # per-host window's exchange — only prefix rows shuffle/sort
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "17179869184" in plan  # the stable-group expr's 2^34 stride
    assert f"<= {info['prefix_max_group']}" in plan
    q.unpersist()


def test_pruned_widens_when_hot_host_concentrates_prefix(spark):
    # the best-priority block belongs almost entirely to ONE host, so a
    # per-host budget of 1 caps the initial prefix below the global
    # budget — the widening loop must extend and still match exactly
    d = F.col("id")
    q = spark.range(5000).select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        F.when(d < 400, F.lit("hot")).otherwise(
            F.concat(F.lit("h"), (d % 20).cast("string"))).alias("host"),
        F.lit(2.0).alias("score"),
        F.lit(0).cast("int").alias("depth"),
        d.alias("discovered_seq"),
    ).cache()
    counts = grouped_counts(q, stable_dequeue_group_expr(seq_block=64))
    info: dict = {}
    pruned = dequeue_pruned(q, politeness_budget=1, global_budget=10,
                            grp_counts=counts, info=info, seq_block=64)
    plain = dequeue(q, politeness_budget=1, global_budget=10, max_seq=5000)
    _cmp(pruned, plain)
    q.unpersist()


def test_pruned_survives_stale_undercounting_counts(spark):
    """Safety net: if a future queue-mutation path forgets to update
    grp_counts, the terminal 'whole' pass must dequeue the UNFILTERED
    queue — stale counts may cost performance, never rows."""
    q = _queue(spark, n=500, hosts=5).cache()
    full_counts = grouped_counts(q, stable_dequeue_group_expr())
    # simulate drift: the counts have never heard of the highest groups
    known = sorted(g for g, n in full_counts.items() if n > 0)
    stale = {g: n for g, n in full_counts.items() if g <= known[len(known) // 2]}
    pruned = dequeue_pruned(q, politeness_budget=100, global_budget=400,
                            grp_counts=stale)
    plain = dequeue(q, politeness_budget=100, global_budget=400, max_seq=500)
    _cmp(pruned, plain)
    q.unpersist()


def test_pruned_handles_exhaustion_and_empty(spark):
    q = _queue(spark, n=30, hosts=3).cache()
    counts = grouped_counts(q, stable_dequeue_group_expr())
    # budget larger than the whole queue → prefix widens to everything
    pruned = dequeue_pruned(q, politeness_budget=100, global_budget=1000,
                            grp_counts=counts)
    plain = dequeue(q, politeness_budget=100, global_budget=1000, max_seq=30)
    _cmp(pruned, plain)
    empty = q.filter(F.lit(False))
    got = dequeue_pruned(empty, politeness_budget=2, global_budget=5,
                         grp_counts={})
    assert got.count() == 0
    q.unpersist()
