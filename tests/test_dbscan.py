"""X5 distributed DBSCAN vs a from-scratch classic DBSCAN oracle.

Cluster labels are arbitrary in DBSCAN (sklearn's depend on scan
order); what is semantically fixed is the PARTITION: core-point
components, the noise set, and — for border points — membership in the
cluster of SOME core neighbor. The oracle checks exactly that."""

import random

import pytest

from text2mc_dataprocessor_spark.operators.dbscan import (
    cluster_extents,
    dbscan_labels,
)


def python_dbscan(pts, eps, min_samples):
    """Classic DBSCAN (BFS expansion). Returns (labels, core_flags)."""
    n = len(pts)
    nbr = [
        [j for j in range(n)
         if (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
         <= eps * eps]
        for i in range(n)
    ]
    core = [len(nbr[i]) >= min_samples for i in range(n)]
    labels = [None] * n
    cid = 0
    for i in range(n):
        if labels[i] is not None or not core[i]:
            continue
        labels[i] = cid
        stack = [i]
        while stack:
            j = stack.pop()
            for k in nbr[j]:
                if labels[k] is None:
                    labels[k] = cid
                    if core[k]:
                        stack.append(k)
        cid += 1
    labels = [-1 if v is None else v for v in labels]
    return labels, core, nbr


def check_equivalent(pts, eps, min_samples, spark_labels):
    want, core, nbr = python_dbscan(pts, eps, min_samples)
    got = [spark_labels[p] for p in pts]
    # noise sets identical
    assert {p for p, g in zip(pts, got) if g == -1} == \
        {p for p, w in zip(pts, want) if w == -1}
    # core partition identical up to relabeling (bijective label map)
    fwd, bwd = {}, {}
    for i, p in enumerate(pts):
        if not core[i]:
            continue
        w, g = want[i], got[i]
        assert fwd.setdefault(w, g) == g and bwd.setdefault(g, w) == w, p
    # border points: must carry the cluster of some core neighbor
    for i, p in enumerate(pts):
        if core[i] or got[i] == -1:
            continue
        assert got[i] in {got[k] for k in nbr[i] if core[k]}, p


def run_spark_dbscan(spark, pts, eps=5.0, min_samples=5):
    df = spark.createDataFrame(list(pts), "x int, z int")
    out = dbscan_labels(df, eps=eps, min_samples=min_samples)
    return {(r.x, r.z): r.label for r in out.collect()}


def test_two_blobs_and_noise(spark):
    blob_a = [(x, z) for x in range(3) for z in range(3)]          # 9 pts
    blob_b = [(x + 100, z) for x in range(3) for z in range(3)]    # far away
    noise = [(50, 50), (-60, 33)]
    pts = blob_a + blob_b + noise
    labels = run_spark_dbscan(spark, pts)
    check_equivalent(pts, 5.0, 5, labels)
    # deterministic numbering: blob_a anchors at (0,0) -> cluster 0
    assert labels[(0, 0)] == 0 and labels[(100, 0)] == 1
    assert labels[(50, 50)] == -1


def test_chain_merges_across_cells(spark):
    # a 1-spaced line crosses many eps-cells; all one cluster
    pts = [(x, 0) for x in range(0, 40)]
    labels = run_spark_dbscan(spark, pts, eps=2.0, min_samples=3)
    check_equivalent(pts, 2.0, 3, labels)
    assert set(labels.values()) == {0}


def test_border_point_attaches(spark):
    blob = [(x, z) for x in range(3) for z in range(3)]
    border = [(7, 1)]  # within eps=5 of the blob edge, itself not core
    pts = blob + border
    labels = run_spark_dbscan(spark, pts)
    check_equivalent(pts, 5.0, 5, labels)
    assert labels[(7, 1)] == labels[(0, 0)]


def test_random_scatter_matches_oracle(spark):
    rng = random.Random(1234)
    pts = list({(rng.randrange(0, 30), rng.randrange(0, 30))
                for _ in range(140)})
    labels = run_spark_dbscan(spark, pts, eps=3.0, min_samples=4)
    check_equivalent(pts, 3.0, 4, labels)


def test_duplicates_count_toward_density(spark):
    # 5 copies of one coord + nothing else: the point is its own core
    df = spark.createDataFrame([(4, 4)] * 5, "x int, z int")
    out = dbscan_labels(df, eps=5.0, min_samples=5)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].label == 0  # distinct-coord output


def test_cluster_extents(spark):
    blob = [(x, z) for x in range(3) for z in range(4)]
    labels = run_spark_dbscan(spark, blob)
    df = spark.createDataFrame(
        [(x, z, labels[(x, z)]) for x, z in blob], "x int, z int, label long"
    )
    ext = cluster_extents(df).collect()
    assert len(ext) == 1
    e = ext[0]
    assert (e.low_x, e.high_x, e.low_z, e.high_z) == (0, 2, 0, 3)

def test_long_chain_runs_to_fixpoint_and_max_iter_raises(spark):
    # one chain-shaped cluster whose propagation diameter exceeds a
    # small max_iter: the bound must RAISE (silently stopping would
    # emit one cluster as several); the fixpoint default must converge
    pts = [(x, 0) for x in range(0, 30)]
    df = spark.createDataFrame(list(pts), "x int, z int")
    with pytest.raises(RuntimeError, match="did not converge"):
        dbscan_labels(df, eps=1.5, min_samples=2, max_iter=3)
    labels = run_spark_dbscan(spark, pts, eps=1.5, min_samples=2)
    check_equivalent(pts, 1.5, 2, labels)
    assert set(labels.values()) == {0}


def test_local_and_distributed_paths_agree(spark, monkeypatch):
    """r6: small distinct point sets solve driver-locally (bounded
    collect + union-find); the distributed min-label loop is the
    at-scale path. Both must emit the IDENTICAL labeled partition —
    including border-point min-label assignment and (min x, min z)
    renumbering — on randomized inputs."""
    import text2mc_dataprocessor_spark.operators.dbscan as mod

    rng = random.Random(99)
    for trial in range(3):
        pts = list({(rng.randrange(0, 40), rng.randrange(0, 40))
                    for _ in range(120 + 40 * trial)})
        df = spark.createDataFrame(list(pts), "x int, z int")
        local = sorted(map(tuple, dbscan_labels(
            df, eps=3.0, min_samples=3).collect()))
        monkeypatch.setattr(mod, "LOCAL_MAX_POINTS", -1)  # force distributed
        dist = sorted(map(tuple, dbscan_labels(
            df, eps=3.0, min_samples=3).collect()))
        monkeypatch.undo()
        assert local == dist
