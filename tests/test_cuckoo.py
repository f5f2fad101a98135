"""Cuckoo filter: insert/contains/delete round-trip, no false negatives,
serialization."""

import numpy as np

from text2mc_dataprocessor_spark.operators.cuckoo import CuckooFilter


def test_insert_contains():
    cf = CuckooFilter(capacity=5000)
    keys = list(range(-2500, 2500))
    for k in keys:
        assert cf.insert(k)
    assert all(cf.contains(k) for k in keys)  # no false negatives


def test_delete_round_trip():
    cf = CuckooFilter(capacity=1000)
    for k in range(1000):
        assert cf.insert(k)
    for k in range(0, 1000, 2):
        assert cf.delete(k)
    # deleted keys are (almost surely) gone; kept keys all remain
    assert all(cf.contains(k) for k in range(1, 1000, 2))
    false_pos = sum(cf.contains(k) for k in range(0, 1000, 2))
    assert false_pos < 20  # residual fingerprint collisions only


def test_fpr_reasonable():
    cf = CuckooFilter(capacity=10_000)
    for k in range(10_000):
        cf.insert(k)
    fresh = np.arange(1_000_000, 1_020_000)
    fp = int(cf.contains_many(fresh).sum())
    assert fp / len(fresh) < 0.01  # 16-bit fp, 4 slots → ~0.1% expected


def test_serialization_round_trip():
    cf = CuckooFilter(capacity=500)
    for k in range(500):
        cf.insert(k)
    clone = CuckooFilter.from_bytes(cf.to_bytes())
    assert all(clone.contains(k) for k in range(500))
    assert clone.delete(123)


def test_contains_many_matches_scalar():
    """The vectorized probe must agree bit-for-bit with the scalar path."""
    cf = CuckooFilter(capacity=4000)
    rng = np.random.default_rng(5)
    keys = rng.integers(-(2**62), 2**62, size=3000, dtype=np.int64)
    for k in keys:
        assert cf.insert(int(k))
    mixed = np.concatenate([keys[:1500], rng.integers(-(2**62), 2**62, size=1500, dtype=np.int64)])
    vec = cf.contains_many(mixed)
    scalar = np.array([cf.contains(int(k)) for k in mixed])
    assert (vec == scalar).all()


def test_insert_many_parity_with_scalar_path():
    """Vectorized batch insert ≡ scalar loop in membership: a key may
    land in its alternate bucket or a different slot, but contains()
    probes both buckets, so no inserted key may ever probe unseen, and
    the false-positive surface must stay the same order."""
    rng = np.random.default_rng(11)
    keys = rng.integers(-(2**62), 2**62, size=8000, dtype=np.int64)
    vec = CuckooFilter(capacity=10_000)
    vec.insert_many(keys)
    scalar = CuckooFilter(capacity=10_000)
    for k in keys:
        assert scalar.insert(int(k))
    # zero false negatives on both paths
    assert vec.contains_many(keys).all()
    assert scalar.contains_many(keys).all()
    # same stored-fingerprint population (multiset of slots used)
    assert (vec.table != 0).sum() == (scalar.table != 0).sum()
    fresh = rng.integers(2**62, 2**63 - 1, size=20_000, dtype=np.int64)
    assert abs(int(vec.contains_many(fresh).sum())
               - int(scalar.contains_many(fresh).sum())) < 40


def test_insert_many_eviction_fallback_at_high_load():
    """Push a table to ~94% load so the scalar eviction fallback
    actually runs (4-way cuckoo needs kicks well before that), then
    verify zero false negatives and duplicate-batch handling
    (duplicates occupy multiple slots, like repeated scalar inserts)."""
    cf = CuckooFilter(capacity=600)  # 256 buckets × 4 slots = 1024
    keys = np.arange(910, dtype=np.int64)
    cf.insert_many(np.concatenate([keys, keys[:50]]))  # dups in-batch
    assert cf.contains_many(keys).all()
    assert (cf.table != 0).sum() == 960


def test_cuckoo_seen_set_no_false_negatives(spark):
    """Distributed CuckooSeenSet: build → probe, zero false negatives
    (same property contract as the Bloom suite), then delete → the
    deleted keys probe unseen again."""
    import pandas as pd
    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.operators.cuckoo import CuckooSeenSet

    cs = CuckooSeenSet(n_buckets=16, capacity_per_bucket=2000)
    urls = [f"https://h{i % 7}.example/p/{i}" for i in range(10_000)]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    keyed = df.withColumn("url_hash", F.xxhash64("url")).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(16)).cast("int")
    )
    table = cs.build(keyed).cache()
    probed = CuckooSeenSet.probe(keyed, table)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # NO false negatives

    # delete every third url → those probe unseen again (allowing only
    # residual fingerprint collisions); the rest still all probe seen
    dels = keyed.filter(F.xxhash64("url") % 3 == 0)
    kept = keyed.filter(F.xxhash64("url") % 3 != 0)
    table2 = cs.delete(table, dels.select("bucket", "url_hash")).cache()
    still = CuckooSeenSet.probe(dels, table2).filter(F.col("maybe_seen")).count()
    assert still < dels.count() * 0.05, still
    assert CuckooSeenSet.probe(kept, table2).filter(~F.col("maybe_seen")).count() == 0


def test_dedup_split_over_cuckoo(spark):
    """split path parameterized over the cuckoo filter: returns exactly
    the unseen urls, first occurrence per duplicate."""
    import pandas as pd
    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.operators.cuckoo import (
        CuckooSeenSet,
        cuckoo_probe_batch,
    )
    from text2mc_dataprocessor_spark.operators.seen import dedup_and_split_new

    cs = CuckooSeenSet(n_buckets=8, capacity_per_bucket=1000)
    seen_urls = [f"https://s/{i}" for i in range(3000)]
    new_urls = [f"https://n/{i}" for i in range(400)]

    def keyed(urls, ranks):
        pdf = pd.DataFrame({"url": urls, "parent_rank": ranks,
                            "dom_pos": list(range(len(urls)))})
        return (
            spark.createDataFrame(pdf)
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(8)).cast("int"))
        )

    seen = keyed(seen_urls, [0] * len(seen_urls)).select("url", "url_hash", "bucket")
    table = cs.build(seen)
    # candidates: a third of the seen urls + the new urls, each new url twice
    cand_urls = seen_urls[::3] + new_urls + new_urls
    ranks = list(range(len(cand_urls)))
    out = dedup_and_split_new(
        keyed(cand_urls, ranks), seen, table,
        dedup_order=["parent_rank", "dom_pos"],
        probe_batch=cuckoo_probe_batch,
    ).collect()
    got = {r.url for r in out}
    assert got == set(new_urls)
    # first-occurrence: the kept row carries the FIRST duplicate's rank
    first_rank = {u: r for u, r in zip(cand_urls, ranks) if u in set(new_urls)}
    want_rank = {}
    for u, r in zip(cand_urls, ranks):
        want_rank.setdefault(u, r)
    assert {r.url: r.parent_rank for r in out} == {
        u: want_rank[u] for u in set(new_urls)
    }
