"""Cuckoo-filter variant of the URL-seen set (deletable).

Same role as ``operators.seen.PartitionedBloom`` but supports deletes —
needed when frontier rows are retired (e.g. re-crawl scheduling drops a
URL from the seen set so it can be rediscovered). Standard
Fan-et-al-style design: 4-slot buckets, 16-bit fingerprints, partial-
key cuckoo hashing (alternate index = index XOR hash(fingerprint), table
size a power of two), bounded eviction chain.

numpy-backed and serializable to bytes, so it rides the same
per-key-bucket partitioning and snapshot layer as the Bloom filter.
Per-partition build/probe run inside grouped Arrow UDFs via
``CuckooSeenSet`` below.
"""

from __future__ import annotations

import numpy as np

_FP_MIX = np.uint64(0xFF51AFD7ED558CCD)
MAX_KICKS = 500


def _next_pow2(n: int) -> int:
    return 1 << max(4, (n - 1).bit_length())


class CuckooFilter:
    """Single-partition cuckoo filter over int64 keys."""

    def __init__(self, capacity: int, *, _table: np.ndarray | None = None,
                 seed: int = 0):
        if _table is not None:
            self.table = _table
        else:
            n_buckets = _next_pow2(int(capacity / 0.95 / 4) + 1)
            self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.n_buckets = self.table.shape[0]
        self._mask = np.uint64(self.n_buckets - 1)
        self._rng = np.random.default_rng(seed)  # eviction slot choice (deterministic)

    # -- key → (fingerprint, i1, i2) — plain-int 64-bit wrap arithmetic ------
    def _fp_index(self, key: int) -> tuple[int, int]:
        k = int(key) & 0xFFFFFFFFFFFFFFFF
        h = ((k ^ (k >> 33)) * int(_FP_MIX)) & 0xFFFFFFFFFFFFFFFF
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        i1 = k & (self.n_buckets - 1)
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        h = (fp * int(_FP_MIX)) & 0xFFFFFFFFFFFFFFFF
        return (i ^ h) & (self.n_buckets - 1)

    # -- ops ------------------------------------------------------------------
    def insert(self, key: int) -> bool:
        fp, i1 = self._fp_index(key)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return True
        i = i1 if self._rng.integers(2) else i2
        cur = fp
        for _ in range(MAX_KICKS):
            slot = int(self._rng.integers(4))
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = self._alt_index(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                return True
        return False  # table full — caller should resize/re-bucket

    def contains(self, key: int) -> bool:
        fp, i1 = self._fp_index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        return np.fromiter((self.contains(int(k)) for k in keys), dtype=bool,
                           count=len(keys))

    def delete(self, key: int) -> bool:
        fp, i1 = self._fp_index(key)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            hits = np.flatnonzero(self.table[i] == fp)
            if hits.size:
                self.table[i, hits[0]] = 0
                return True
        return False

    # -- serialization ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        arr = np.frombuffer(data, dtype=np.uint16).reshape(-1, 4).copy()
        return cls(0, _table=arr)
