"""Dedup suite: exact first-occurrence, MinHash-LSH vs brute-force
Jaccard, SimHash banding, exact n-gram Jaccard."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators import dedup as D


def _jaccard(a: str, b: str, n: int = 3) -> float:
    def grams(t):
        toks = t.split(" ")
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a), grams(b)
    return len(ga & gb) / len(ga | gb)


@pytest.fixture(scope="module")
def doc_corpus():
    """Synthetic docs with planted near-duplicates."""
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for i in range(60):
        base = " ".join(rng.choice(vocab) for _ in range(40))
        docs.append((i * 10, base))
        if i % 3 == 0:  # plant a near-dup: mutate 2 tokens
            toks = base.split(" ")
            for _ in range(2):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            docs.append((i * 10 + 1, " ".join(toks)))
        if i % 5 == 0:  # plant an exact dup
            docs.append((i * 10 + 2, base))
    return pd.DataFrame(docs, columns=["doc_id", "text"])


def test_exact_dedup_first_occurrence(spark, doc_corpus):
    df = spark.createDataFrame(doc_corpus)
    out = D.exact_dedup(df).toPandas()
    dups = out[out.n_occurrences > 1]
    assert len(dups) == len([1 for i in range(60) if i % 5 == 0])
    # representative is always the smallest doc_id
    grouped = doc_corpus.groupby("text")["doc_id"].min()
    got = dict(zip(out.text, out.first_seq))
    assert all(got[t] == s for t, s in grouped.items())


def test_minhash_estimates_jaccard(spark, doc_corpus):
    df = spark.createDataFrame(doc_corpus)
    pairs = D.minhash_lsh_pairs(df, threshold=0.5, n_hashes=128, bands=32).toPandas()
    texts = dict(zip(doc_corpus.doc_id, doc_corpus.text))
    assert len(pairs) > 0
    for r in pairs.itertuples(index=False):
        true_j = _jaccard(texts[r.id_a], texts[r.id_b])
        assert abs(r.est_jaccard - true_j) < 0.25, (r.id_a, r.id_b, r.est_jaccard, true_j)
    # recall: all planted near-dup pairs (true J ≥ 0.8) must be found
    found = {(r.id_a, r.id_b) for r in pairs.itertuples(index=False)}
    for i in range(0, 600, 30):
        if (i in texts) and (i + 1 in texts):
            if _jaccard(texts[i], texts[i + 1]) >= 0.8:
                assert (i, i + 1) in found, f"missed planted near-dup {i}"


def test_simhash_finds_exact_and_near(spark, doc_corpus):
    df = spark.createDataFrame(doc_corpus)
    pairs = D.simhash_pairs(df, max_hamming=10).toPandas()
    found = {(r.id_a, r.id_b) for r in pairs.itertuples(index=False)}
    # exact dups have hamming 0 → must all be found
    for i in range(0, 600, 50):
        if i in set(doc_corpus.doc_id) and (i + 2) in set(doc_corpus.doc_id):
            assert (i, i + 2) in found, f"missed exact dup {i}"
    ham = dict(((r.id_a, r.id_b), r.hamming) for r in pairs.itertuples(index=False))
    for i in range(0, 600, 50):
        if (i, i + 2) in ham:
            assert ham[(i, i + 2)] == 0


def test_ngram_jaccard_exact(spark, doc_corpus):
    df = spark.createDataFrame(doc_corpus)
    pairs = D.ngram_jaccard_pairs(df, threshold=0.5).toPandas()
    texts = dict(zip(doc_corpus.doc_id, doc_corpus.text))
    assert len(pairs) > 0
    for r in pairs.itertuples(index=False):
        # relational Jaccard must equal the Python set computation exactly
        assert r.jaccard == pytest.approx(_jaccard(texts[r.id_a], texts[r.id_b]))


def test_minhash_deterministic(spark, doc_corpus):
    df = spark.createDataFrame(doc_corpus.head(10))
    a = D.with_minhash(df).select("doc_id", "minhash").toPandas().sort_values("doc_id")
    b = D.with_minhash(df).select("doc_id", "minhash").toPandas().sort_values("doc_id")
    assert a.minhash.map(tuple).tolist() == b.minhash.map(tuple).tolist()


def test_vectorized_fnv_matches_scalar():
    """The batched FNV-1a must be bit-identical to the per-char loop."""
    import numpy as np

    from text2mc_dataprocessor_spark.operators.dedup import _FNV_BASIS, _fnv1a_batch

    def scalar(b: bytes, basis: int) -> int:
        h = basis
        for ch in b:
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    items = [b"", b"a", b"hello world", "unicode ünïcødé".encode("utf-8"),
             b"x" * 300, b"the quick brown fox"]
    for basis in (_FNV_BASIS, _FNV_BASIS ^ 29):
        got = _fnv1a_batch(items, basis=basis)
        want = np.array([scalar(b, basis) for b in items], dtype=np.uint64)
        assert (got == want).all()


def test_signatures_match_scalar_reference(spark):
    """Vectorized minhash/simhash signatures equal a direct scalar
    reimplementation of the round-1 per-char algorithms (pair sets
    therefore unchanged by the vectorization)."""
    import numpy as np
    import pandas as pd

    from text2mc_dataprocessor_spark.operators.dedup import (
        _MERSENNE,
        _minhash_params,
        minhash_signature_udf,
        simhash_udf,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one two",
        "a b c d e f g h i j k l m n o p",
        "double  space and ünïcødé tokens here",
    ]

    def fnv(b: bytes, basis=0xCBF29CE484222325) -> int:
        h = basis
        for ch in b:
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def scalar_minhash(t, n_hashes=16, n=3, seed=13):
        if not t:
            return [0] * n_hashes
        a, b = _minhash_params(n_hashes, seed)
        toks = t.split(" ")
        grams = [" ".join(toks)] if len(toks) < n else [
            " ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)
        ]
        sh = np.array([fnv(g.encode()) for g in grams], dtype=np.uint64) % np.uint64(_MERSENNE)
        au, bu = a.astype(np.uint64), b.astype(np.uint64)
        vals = (au[:, None] * sh[None, :] + bu[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1).astype(np.int64).tolist()

    def scalar_simhash(t, seed=29):
        if not t:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for tok in t.split(" "):
            h = fnv(tok.encode(), basis=0xCBF29CE484222325 ^ seed)
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out - (1 << 64) if out >= (1 << 63) else out

    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got_mh = [r.s for r in df.select(minhash_signature_udf(16, 3, 13)("text").alias("s")).collect()]
    assert got_mh == [scalar_minhash(t) for t in texts]
    got_sh = [r.s for r in df.select(simhash_udf(29)("text").alias("s")).collect()]
    assert got_sh == [scalar_simhash(t) for t in texts]


def test_simhash_pigeonhole_guard(spark):
    """n_bands must exceed max_hamming (ADVICE: bands ≤ hamming silently
    drops pairs); the default auto-picks a valid band count."""
    import pandas as pd
    import pytest

    from text2mc_dataprocessor_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b"]}))
    with pytest.raises(ValueError):
        simhash_pairs(docs, max_hamming=8, n_bands=4)
    # default n_bands=None auto-selects 16 for max_hamming=8
    assert simhash_pairs(docs, max_hamming=8).count() == 1


def test_dup_clusters_transitive_chain(spark):
    """A~B, B~C is ONE component even though (A, C) was never a pair;
    disjoint pairs stay separate; labels are the component min."""
    from text2mc_dataprocessor_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_keep_representatives(spark):
    from text2mc_dataprocessor_spark.operators.dedup import keep_representatives

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 10, 11, 99)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    kept = sorted(r.doc_id for r in keep_representatives(docs, pairs).collect())
    # one representative (min id) per cluster + the untouched singleton
    assert kept == [1, 10, 99]


def test_keep_representatives_never_forces_broadcast(spark):
    """VERDICT r4 #4: the loser set scales with the corpus (20-50% of
    docs at web dedup rates) — keep_representatives must NOT carry a
    broadcast hint. With both broadcast thresholds at -1, ONLY a forced
    hint could still produce a BroadcastExchange (hints override
    thresholds), so its absence in the executed plan proves the hint is
    gone while AQE remains free to broadcast when the set IS small."""
    from text2mc_dataprocessor_spark.operators.dedup import keep_representatives

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        docs = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"), F.concat(F.lit("doc "), "id").alias("text")
        )
        # every even id pairs with its successor -> 1000 losers
        pairs = spark.range(0, 2000, 2).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        kept = keep_representatives(docs, pairs)
        rows = kept.collect()
        assert len(rows) == 1000 and all(r.doc_id % 2 == 0 for r in rows)
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dedup_paragraphs_first_occurrence(spark):
    """Global first-by-(doc, position) wins; docs reassemble in original
    paragraph order; fully-duplicated docs drop (or stay empty with
    keep_empty)."""
    from text2mc_dataprocessor_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, "A\nB"), (2, "B\nC"), (3, "A\nC"), (4, "D\nA\nE")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_kept)
           for r in dedup_paragraphs(docs).collect()}
    assert got == {1: ("A\nB", 2), 2: ("C", 1), 4: ("D\nE", 2)}

    kept = {r.doc_id: (r.text, r.n_kept)
            for r in dedup_paragraphs(docs, keep_empty=True).collect()}
    assert kept[3] == ("", 0) and len(kept) == 4


def test_embedding_near_dup_threshold(spark):
    """Cosine near-dup over embeddings: planted near-but-not-identical
    vectors (cos ~0.98, above the 0.95 threshold) are all recovered
    through the hyperplane-LSH candidate path, and no natural pair of
    the random corpus (max cos well under the threshold) leaks in.
    Deterministic: fixed vector seed + fixed LSH hyperplane seed."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 64)).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(30)]
    expected = set()
    for i in range(0, 30, 3):
        v = base[i] + 0.02 * rng.normal(size=64).astype("float32")
        v /= np.linalg.norm(v)
        cos = float(base[i] @ v)
        assert 0.95 < cos < 1.0
        rows.append((1000 + i, [float(x) for x in v]))
        expected.add((i, 1000 + i))
    # sanity: no natural pair can cross the threshold
    sims = base @ base.T
    np.fill_diagonal(sims, -1)
    assert sims.max() < 0.6

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = D.embedding_near_dup(df, dim=64, threshold=0.95)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == expected


def test_dup_clusters_local_and_distributed_agree(spark, monkeypatch):
    """r6: small pair sets solve as a driver-local union-find; the
    distributed min-label loop is the at-scale path. Identical
    (doc_id, cluster_id) output on randomized graphs, long and string
    ids alike."""
    import random

    import text2mc_dataprocessor_spark.operators.dedup as mod

    rng = random.Random(7)
    pairs = list({(rng.randrange(0, 60), rng.randrange(0, 60))
                  for _ in range(80) })
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    sdf = spark.createDataFrame(
        [(f"u{a}", f"u{b}") for a, b in pairs], "id_a string, id_b string")
    for frame in (df, sdf):
        local = sorted(map(tuple, mod.dup_clusters(frame).collect()))
        monkeypatch.setattr(mod, "_LOCAL_MAX_EDGES", -1)
        dist = sorted(map(tuple, mod.dup_clusters(frame).collect()))
        monkeypatch.undo()
        assert local == dist and len(local) > 0
