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
