"""X5 — DBSCAN over 2-D chunk coordinates, distributed.

The reference clusters build chunks with sklearn ``DBSCAN(eps=5,
min_samples=5)`` on (chunk.x, chunk.z) and takes per-cluster bounding
boxes (/root/reference/world2vec/world2vec.py:310-345). sklearn is
single-node; the Spark re-expression is the standard grid-cell
decomposition (the MR-DBSCAN family of published approaches):

1. **Cell assignment** — cell = (⌊x/eps⌋, ⌊z/eps⌋). With cell width
   eps, any two points within eps are in the same or adjacent cells,
   so the neighbor search is an EQUI-join: explode each point to its
   3×3 cell block and join on the cell key (the X6 offset-explode
   trick) — never a cross/theta join.
2. **Core points** — neighbor count (within eps, self included, sklearn
   semantics) ≥ min_samples. Duplicate coordinates are collapsed to one
   row with a weight and counted exactly as sklearn would.
3. **Components** — clusters are connected components of the core-core
   eps-graph: iterative min-label propagation (label ← min(label,
   neighbors' labels)) until fixpoint. Each round is one join + one
   groupBy-min; rounds are localCheckpointed so the plan doesn't nest
   (lazy persistence across iterations grows the AQE tree
   geometrically). Iterations ~ graph diameter in cells — tiny for
   blob-shaped builds; ``max_iter`` bounds pathological chains.
4. **Border points** — non-core points within eps of ≥1 core join the
   MINIMUM core cluster label. (sklearn assigns whichever core reaches
   them first in scan order; the min rule is the deterministic
   canonicalization of that order-dependence.)
5. **Labels** — clusters renumbered 0..k−1 by (min x, min z) so output
   is deterministic and partition-order-free; noise = −1 (sklearn's
   labels are also arbitrary 0..k−1 ints; only the PARTITION is
   semantically meaningful).

Scale: every stage is an equi-join or aggregation on the cell / point
key; the 9× candidate expansion is the standard space-for-shuffle
trade, and density skew (one hot cell) is bounded because a cell
contains at most eps² distinct integer coords.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NINE = [(dx, dz) for dx in (-1, 0, 1) for dz in (-1, 0, 1)]


def _neighbor_pairs(pts: DataFrame, eps: float) -> DataFrame:
    """(pid, qid) for all point pairs within eps (self included).
    pts: (pid, x, z, w, cx, cz)."""
    probe = pts.select(
        F.col("pid").alias("p"), F.col("x").alias("px"),
        F.col("z").alias("pz"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("cx") + dx).alias("cx"),
                    (F.col("cz") + dz).alias("cz"),
                )
                for dx, dz in _NINE
            ])
        ).alias("c"),
    ).select("p", "px", "pz", F.col("c.cx").alias("cx"),
             F.col("c.cz").alias("cz"))
    base = pts.select(
        F.col("pid").alias("q"), F.col("x").alias("qx"),
        F.col("z").alias("qz"), F.col("w").alias("qw"), "cx", "cz",
    )
    d2 = (F.col("px") - F.col("qx")) ** 2 + (F.col("pz") - F.col("qz")) ** 2
    return probe.join(base, ["cx", "cz"]).filter(d2 <= eps * eps).select(
        "p", "q", "qw"
    )


def dbscan_labels(df: DataFrame, x_col: str = "x", z_col: str = "z",
                  eps: float = 5.0, min_samples: int = 5,
                  max_iter: int | None = None) -> DataFrame:
    """→ distinct (x, z, label): DBSCAN partition of the input's
    coordinate set. label ≥ 0 per cluster (numbered by (min x, min z)),
    −1 for noise. Join back on (x, z) to label full rows.

    Min-label propagation runs to FIXPOINT by default (each round is
    one join+groupBy; round count ~ core-graph diameter in cells, so a
    chain-shaped cluster converges in O(chain length) cheap rounds).
    ``max_iter`` is a safety bound for callers that need one: hitting
    it with labels still changing RAISES rather than silently emitting
    one cluster as several (which downstream would export as several
    builds)."""
    pts = (
        df.groupBy(F.col(x_col).alias("x"), F.col(z_col).alias("z"))
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("cx", F.floor(F.col("x") / eps))
        .withColumn("cz", F.floor(F.col("z") / eps))
        .withColumn("pid", F.xxhash64("x", "z"))
        .persist()
    )
    pairs = _neighbor_pairs(pts, eps).persist()

    core = (
        pairs.groupBy("p").agg(F.sum("qw").alias("n"))
        .filter(F.col("n") >= min_samples)
        .select(F.col("p").alias("pid"))
        .persist()
    )

    # core-core edges (both directions present by construction)
    cores = core.select(F.col("pid").alias("p"))
    edges = (
        pairs.join(cores, "p")
        .join(core.select(F.col("pid").alias("q")), "q")
        .select("p", "q")
        .persist()
    )

    labels = core.select("pid", F.col("pid").alias("label"))
    labels = labels.localCheckpoint()
    it = 0
    while True:
        nbr_min = (
            edges.join(labels, edges.p == labels.pid)
            .groupBy(F.col("q").alias("pid"))
            .agg(F.min("label").alias("nbr"))
        )
        # carry the per-row changed flag INSIDE the checkpointed frame:
        # the convergence probe is then a filter over already-
        # materialized rows instead of a second join of new × labels —
        # one cheap job per iteration instead of a shuffling one (r6)
        new = labels.join(nbr_min, "pid", "left").select(
            "pid",
            F.least("label", F.coalesce("nbr", "label")).alias("label"),
            (F.coalesce("nbr", "label") < F.col("label")).alias("_chg"),
        )
        new = new.localCheckpoint()  # plan would nest geometrically otherwise
        changed = new.filter("_chg").limit(1).count()
        labels = new.drop("_chg")
        if changed == 0:
            break
        it += 1
        if max_iter is not None and it >= max_iter:
            raise RuntimeError(
                f"dbscan label propagation did not converge in {max_iter} "
                "iterations (cluster diameter exceeds the bound) — raise "
                "max_iter or leave it None to run to fixpoint"
            )

    # border points: non-core with ≥1 core neighbor → min core label
    border = (
        pairs.join(core.select(F.col("pid").alias("q")), "q")
        .join(core, pairs.p == core.pid, "left_anti")
        .join(labels.withColumnRenamed("pid", "q"), "q")
        .groupBy(F.col("p").alias("pid"))
        .agg(F.min("label").alias("label"))
    )
    clustered = labels.unionByName(border)

    # renumber components 0..k-1 by (min x, min z); everything else -1
    with_xy = clustered.join(pts.select("pid", "x", "z"), "pid")
    anchors = (
        with_xy.groupBy("label")
        .agg(F.min(F.struct("x", "z")).alias("a"))
        .select("label", "a")
    )
    from .frontier import with_global_rank

    rank_info: dict = {}
    ranked = with_global_rank(
        anchors, [F.col("a.x").asc(), F.col("a.z").asc()], out="_rk",
        info=rank_info,
    ).select("label", (F.col("_rk") - 1).cast("long").alias("cluster"))
    out = (
        pts.select("pid", "x", "z")
        .join(
            with_xy.select("pid", "label").join(F.broadcast(ranked), "label"),
            "pid", "left",
        )
        .select(
            "x", "z",
            F.coalesce(F.col("cluster"), F.lit(-1)).cast("long").alias("label"),
        )
    )
    # materialize before releasing the cached intermediates the plan uses
    out = out.localCheckpoint()
    for c in (pts, pairs, core, edges, *rank_info.get("persisted", [])):
        c.unpersist()
    return out


def cluster_extents(labeled: DataFrame, x_col: str = "x",
                    z_col: str = "z") -> DataFrame:
    """Per-cluster bounding boxes (world2vec.py:341-344), noise
    excluded: (label, low_x, high_x, low_z, high_z)."""
    return (
        labeled.filter(F.col("label") != -1)
        .groupBy("label")
        .agg(
            F.min(x_col).alias("low_x"), F.max(x_col).alias("high_x"),
            F.min(z_col).alias("low_z"), F.max(z_col).alias("high_z"),
        )
    )
