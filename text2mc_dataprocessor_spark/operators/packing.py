"""Sequence packing — training-data prep for fixed-context models.

LLM pretraining consumes documents concatenated into fixed-token-budget
sequences. The packing here is the standard deterministic stream pack:
documents in a stable order (``order_col``), laid head-to-tail on one
token tape; sequence ``seq_id = floor(start_offset / budget)`` and
``seq_pos = start_offset % budget`` (a document crossing a boundary
belongs to the sequence where it starts — split-on-read, the layout
samplers expect). Deterministic given (order, token counts, budget).

Scale shape: the only global state is the running token offset — a
TWO-PHASE cumulative sum exactly like the frontier's distributed rank
(``with_global_rank``): range-partition on the order column, one tiny
per-partition-sums collect for offsets, then a per-partition window.
No single-partition window, no driver-side loop — a 10^10-document
corpus packs in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, budget: int,
                   order_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   n_partitions: int | None = None,
                   info: dict | None = None) -> DataFrame:
    """→ input columns + ``tok_start`` (global token offset),
    ``seq_id``, ``seq_pos``. ``order_col`` must be unique (the tape
    order); ``tokens_col`` the per-document token count.

    ``info`` follows the ``with_global_rank`` convention: pass a dict to
    own releasing ``info["persisted"]`` (and read ``info["total_tokens"]``
    for free); omit it and the result is materialized with internal
    caches dropped. The persist is load-bearing — the range partitioner
    SAMPLES, so an unpinned recompute could draw different bounds than
    the offsets were collected from."""
    release = info is None
    if release:
        info = {}
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = df.repartitionByRange(n_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    info.setdefault("persisted", []).append(part)
    sums = {
        r._pid: r.s
        for r in part.groupBy("_pid")
        .agg(F.sum(tokens_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)
    info["total_tokens"] = acc
    if offsets:
        offset_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
    else:
        offset_expr = F.lit(0)
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_end = F.sum(tokens_col).over(w) + offset_expr
    start = (cum_end - F.col(tokens_col)).cast("long")
    out = (
        part.withColumn("tok_start", start)
        .withColumn("seq_id", F.floor(F.col("tok_start") / budget).cast("long"))
        .withColumn("seq_pos", F.pmod(F.col("tok_start"), F.lit(budget)).cast("long"))
        .drop("_pid")
    )
    if release:
        out = out.localCheckpoint(eager=True)
        for c in info["persisted"]:
            c.unpersist()
    return out
