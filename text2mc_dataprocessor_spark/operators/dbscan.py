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
from pyspark.sql import types as T

_NINE = [(dx, dz) for dx in (-1, 0, 1) for dz in (-1, 0, 1)]

#: distinct-coordinate bound for the driver-local solve: below this the
#: whole clustering runs as ONE bounded collect + in-process union-find
#: instead of ~a dozen driver-barrier jobs (persists, per-iteration
#: checkpoints + convergence probes, border/renumber joins) whose cost
#: is fixed at every data size. 16k (pid,x,z,w) rows ≈ 0.5 MB on the
#: driver — the same bounded-collect budget the frontier's offset
#: collects use — and keeps the pure-Python neighbor walk well under a
#: second. Above the bound the distributed loop below runs unchanged
#: (its take() probe doubles as the cache fill).
LOCAL_MAX_POINTS = 16384


def _dbscan_local(spark, rows, eps: float, min_samples: int,
                  x_type, z_type) -> DataFrame:
    """In-process mirror of the distributed path over a bounded
    collected point set — SAME semantics, bit for bit: weighted
    neighbor counts (self included), components over core-core
    eps-edges labeled by min pid, border → min core label, clusters
    renumbered by (min x, min z), noise −1."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType([
        T.StructField("x", x_type), T.StructField("z", z_type),
        T.StructField("label", T.LongType()),
    ])
    n = len(rows)
    if n == 0:
        return spark.createDataFrame([], out_schema)
    xs = np.array([r["x"] for r in rows], dtype=np.float64)
    zs = np.array([r["z"] for r in rows], dtype=np.float64)
    ws = np.array([r["w"] for r in rows], dtype=np.int64)
    pids = np.array([r["pid"] for r in rows], dtype=np.int64)
    grid: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        grid.setdefault(
            (int(np.floor(xs[i] / eps)), int(np.floor(zs[i] / eps))), []
        ).append(i)
    eps2 = eps * eps
    nbrs: list[np.ndarray] = []
    for i in range(n):
        cx, cz = int(np.floor(xs[i] / eps)), int(np.floor(zs[i] / eps))
        cand = [
            j for dx, dz in _NINE
            for j in grid.get((cx + dx, cz + dz), ())
        ]
        cand = np.array(cand, dtype=np.int64)
        d2 = (xs[cand] - xs[i]) ** 2 + (zs[cand] - zs[i]) ** 2
        nbrs.append(cand[d2 <= eps2])
    counts = np.array([ws[a].sum() for a in nbrs], dtype=np.int64)
    core = counts >= min_samples

    # union-find over core-core edges
    parent = np.arange(n, dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in nbrs[i]:
            if core[j]:
                ri, rj = find(i), int(find(int(j)))
                if ri != rj:
                    parent[rj] = ri
    # component label = min pid over the component's CORE members (the
    # min-label-propagation fixpoint)
    comp_min: dict[int, int] = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            p = int(pids[i])
            if r not in comp_min or p < comp_min[r]:
                comp_min[r] = p
    labels = np.zeros(n, dtype=np.int64)
    clustered = np.zeros(n, dtype=bool)
    for i in range(n):
        if core[i]:
            labels[i] = comp_min[find(i)]
            clustered[i] = True
        else:
            # border: min label over core neighbors (if any)
            cl = [comp_min[find(int(j))] for j in nbrs[i] if core[j]]
            if cl:
                labels[i] = min(cl)
                clustered[i] = True
    # renumber components 0..k−1 by (min x, min z); noise −1
    final = np.full(n, -1, dtype=np.int64)
    if clustered.any():
        anchors: dict[int, tuple[float, float]] = {}
        for i in np.nonzero(clustered)[0]:
            lab = int(labels[i])
            a = anchors.get(lab)
            xz = (float(xs[i]), float(zs[i]))
            if a is None or xz < a:
                anchors[lab] = xz
        order = sorted(anchors, key=lambda lab: anchors[lab])
        rank = {lab: k for k, lab in enumerate(order)}
        for i in np.nonzero(clustered)[0]:
            final[i] = rank[int(labels[i])]
    pdf = pd.DataFrame({
        "x": np.array([r["x"] for r in rows]),
        "z": np.array([r["z"] for r in rows]),
        "label": final,
    })
    return spark.createDataFrame(pdf, schema=out_schema)


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
    # bounded-collect fast path (only in the fixpoint-default mode:
    # max_iter callers ask for the bounded distributed loop and its
    # raise contract): a take() one past the bound decides whether the
    # distinct point set fits the driver-local solve (and doubles as
    # the cache fill for the distributed path when it doesn't). ~a
    # dozen fixed driver-barrier jobs collapse to one collect + one
    # local-relation return.
    if max_iter is None:
        head = pts.take(LOCAL_MAX_POINTS + 1)
        if len(head) <= LOCAL_MAX_POINTS:
            schema = {f.name: f.dataType for f in pts.schema.fields}
            out = _dbscan_local(df.sparkSession, head, eps, min_samples,
                                schema["x"], schema["z"])
            pts.unpersist()
            return out
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
