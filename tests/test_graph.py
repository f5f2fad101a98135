"""PageRank: closed-form cases (cycle → uniform, star → known masses),
numpy power-iteration parity on a random graph, determinism."""

import numpy as np
import pytest

from text2mc_dataprocessor_spark.operators.graph import pagerank


def test_cycle_is_uniform(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, n_iter=20).collect()}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_star_known_masses(spark):
    # 1,2,3 → 0; one 20-iter run vs the closed recurrence
    e = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, n_iter=20).collect()}
    leaf = 0.15 / 4  # no in-edges: (1-d)/N every iteration
    center = 0.15 / 4 + 0.85 * 3 * leaf
    assert got[1] == pytest.approx(leaf, abs=1e-12)
    assert got[0] == pytest.approx(center, abs=1e-12)


def test_matches_numpy_power_iteration(spark):
    rng = np.random.default_rng(3)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (300, 2))
                    if a != b})
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, n_iter=8).collect()}

    nodes = sorted({v for t in edges for v in t})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    out = np.zeros(N)
    for a, _ in edges:
        out[idx[a]] += 1
    r = np.full(N, 1 / N)
    for _ in range(8):
        nxt = np.full(N, 0.15 / N)
        for a, b in edges:
            nxt[idx[b]] += 0.85 * r[idx[a]] / out[idx[a]]
        r = nxt
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-9), v


def test_deterministic(spark):
    e = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7],
        "src long, dst long",
    )
    a = sorted((r.node, round(r.rank, 12)) for r in pagerank(e, n_iter=5).collect())
    b = sorted((r.node, round(r.rank, 12)) for r in pagerank(e, n_iter=5).collect())
    assert a == b
