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
        """Vectorized membership probe — identical fp/index math to the
        scalar path (uint64 ops wrap mod 2^64 exactly like the masked
        plain-int arithmetic), with both candidate buckets checked via
        one fancy-indexed comparison each. No per-key Python."""
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        with np.errstate(over="ignore"):
            k = keys.astype(np.int64).view(np.uint64)
            h = (k ^ (k >> np.uint64(33))) * _FP_MIX
            fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
            fp[fp == 0] = 1
            i1 = (k & self._mask).astype(np.int64)
            alt_h = fp.astype(np.uint64) * _FP_MIX
            i2 = ((i1.view(np.uint64) ^ alt_h) & self._mask).astype(np.int64)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def insert_many(self, keys: np.ndarray) -> None:
        """Insert a key batch. The no-eviction path — by far the common
        case at the sized ≤84% load — is fully vectorized: fingerprints
        and both candidate buckets are computed batch-wide (same uint64
        math as ``contains_many``), then each key is scatter-placed into
        the j-th empty slot of its bucket, where j is the key's stable
        within-bucket rank. Only keys whose both buckets fill up fall to
        the scalar eviction-chain ``insert`` (inherently sequential).
        Membership is equivalent to the scalar loop — a key may land in
        its alternate bucket or a different slot, but ``contains`` checks
        both buckets and ignores slot order (parity-tested in
        tests/test_cuckoo.py).

        Raises if a bucket's table saturates — unlike the Bloom path,
        which degrades (higher FPR) instead of failing, a full cuckoo
        table has nowhere to put a fingerprint. Size
        ``capacity_per_bucket ≥ expected urls / n_buckets / 0.84``
        (4-slot cuckoo tables stay insertable to ~95% load; 84% leaves
        skew headroom) so the whole merge job never hits this."""
        keys = np.ascontiguousarray(np.asarray(keys).astype(np.int64))
        if keys.size == 0:
            return
        with np.errstate(over="ignore"):
            k = keys.view(np.uint64)
            h = (k ^ (k >> np.uint64(33))) * _FP_MIX
            fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
            fp[fp == 0] = 1
            i1 = (k & self._mask).astype(np.int64)
            alt_h = fp.astype(np.uint64) * _FP_MIX
            i2 = ((i1.view(np.uint64) ^ alt_h) & self._mask).astype(np.int64)
        pending = np.arange(keys.size)
        for target in (i1, i2):
            if pending.size == 0:
                break
            b = target[pending]
            ub, inv = np.unique(b, return_inverse=True)
            rows = self.table[ub]  # (U, 4) — touched buckets only
            is_empty = rows == 0
            n_empty = is_empty.sum(axis=1)
            # j-th empty slot index per bucket (empties sort first, stable)
            empty_pos = np.argsort(~is_empty, axis=1, kind="stable")
            # stable within-bucket rank of each pending key
            order = np.argsort(inv, kind="stable")
            sorted_inv = inv[order]
            group_start = np.searchsorted(sorted_inv, np.arange(len(ub)))
            ranks = np.empty(len(b), dtype=np.int64)
            ranks[order] = np.arange(len(b)) - group_start[sorted_inv]
            fits = ranks < n_empty[inv]
            if fits.any():
                sel = pending[fits]
                self.table[b[fits], empty_pos[inv[fits], ranks[fits]]] = fp[sel]
            pending = pending[~fits]
        for idx in pending:  # eviction chains — sequential by nature
            if not self.insert(int(keys[idx])):
                raise ValueError(
                    "cuckoo filter bucket saturated — increase "
                    "capacity_per_bucket or n_buckets"
                )

    def delete(self, key: int) -> bool:
        """Remove ONE stored copy of the key's 16-bit fingerprint.

        Standard cuckoo semantics: if another live key collides on
        (bucket, fingerprint, index) — probability ~8/2^16 per
        co-bucketed pair — that key now probes as "definitely unseen",
        which SKIPS the exact backstop (that fast path is what the
        filter exists for), so a ``forget(url_A)`` can occasionally
        cause a colliding url_B to be re-enqueued and re-crawled once
        as a duplicate. A bounded rate of benign duplicate fetches is
        the documented price of deletability; schedules that cannot
        tolerate any should stay on the Bloom filter (no deletes, no
        collateral)."""
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


# ---------------------------------------------------------------------------
# Distributed, partitioned cuckoo seen-set — PartitionedBloom-compatible
# ---------------------------------------------------------------------------

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

def cuckoo_probe_batch(filter_row, keys: np.ndarray) -> np.ndarray:
    """(filter_row, keys)->bool[] membership test — the cuckoo plug-in
    for ``operators.seen.dedup_and_split_new``'s fused dedup+probe."""
    return CuckooFilter.from_bytes(filter_row["bits"]).contains_many(keys)


CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("capacity", T.LongType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)


class CuckooSeenSet:
    """Partitioned cuckoo-filter URL-seen set — the DELETABLE variant of
    ``operators.seen.PartitionedBloom``, behind the same interface
    (``empty`` / ``build`` / ``merge`` / ``probe`` plus ``delete``), so
    the crawl's dedup path runs over either filter unchanged.

    Same layout discipline as the Bloom set: the key space splits into
    ``n_buckets`` by ``pmod(xxhash64(url), P)``; each bucket owns one
    serialized ``CuckooFilter`` table; build/merge/delete are grouped or
    cogrouped Arrow UDFs (no driver collect, no broadcast), and the
    probe is a vectorized per-bucket ``contains_many``. Deletes enable
    re-crawl scheduling: drop a URL from the seen set and the next
    discovery re-enqueues it. Like all cuckoo filters, deleting a key
    that was never inserted is undefined — the crawl only deletes urls
    present in the exact seen table."""

    def __init__(self, n_buckets: int = 64, capacity_per_bucket: int = 100_000,
                 fpr: float | None = None):
        # fpr accepted for interface parity; 16-bit fingerprints give
        # ~0.03% FPR at 95% load regardless
        self.n_buckets = n_buckets
        self.capacity_per_bucket = capacity_per_bucket

    def _new(self) -> CuckooFilter:
        return CuckooFilter(self.capacity_per_bucket)

    def empty(self, spark) -> DataFrame:
        cap = self.capacity_per_bucket
        blank = self._new().to_bytes()
        rows = [(b, cap, 0, blank) for b in range(self.n_buckets)]
        return spark.createDataFrame(rows, CUCKOO_SCHEMA)

    def build(self, keyed: DataFrame) -> DataFrame:
        """keyed: (bucket int, url_hash long)."""
        cap = self.capacity_per_bucket
        n_buckets = self.n_buckets

        def one_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            cf = CuckooFilter(cap)
            keys = pdf["url_hash"].to_numpy(dtype=np.int64)
            cf.insert_many(keys)
            return pd.DataFrame(
                [(int(pdf["bucket"].iloc[0]), cap, len(pdf), cf.to_bytes())],
                columns=["bucket", "capacity", "n_keys", "bits"],
            )

        built = (
            keyed.select("bucket", "url_hash")
            .groupBy("bucket")
            .applyInPandas(one_bucket, CUCKOO_SCHEMA)
        )
        spark = keyed.sparkSession
        blank = self._new().to_bytes()
        all_buckets = spark.range(n_buckets).select(
            F.col("id").cast("int").alias("bucket"),
            F.lit(cap).cast("long").alias("capacity"),
            F.lit(0).cast("long").alias("n_keys"),
            F.lit(blank).alias("bits"),
        )
        return built.unionByName(
            all_buckets.join(built.select("bucket"), "bucket", "left_anti")
        )

    @staticmethod
    def _apply_bucket(op: str):
        def fn(_key, cdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
            if cdf.empty:
                return cdf
            row = cdf.iloc[0]
            cf = CuckooFilter.from_bytes(row["bits"])
            n = int(row["n_keys"])
            if not keys_pdf.empty:
                keys = keys_pdf["url_hash"].to_numpy(dtype=np.int64)
                if op == "insert":
                    cf.insert_many(keys)
                    n += len(keys)
                else:
                    for k in keys:
                        if cf.delete(int(k)):
                            n -= 1
            return pd.DataFrame(
                [(int(row["bucket"]), int(row["capacity"]), n, cf.to_bytes())],
                columns=["bucket", "capacity", "n_keys", "bits"],
            )

        return fn

    def merge(self, cuckoo_df: DataFrame, new_keyed: DataFrame) -> DataFrame:
        return (
            cuckoo_df.groupBy("bucket")
            .cogroup(new_keyed.select("bucket", "url_hash").groupBy("bucket"))
            .applyInPandas(self._apply_bucket("insert"), CUCKOO_SCHEMA)
        )

    def delete(self, cuckoo_df: DataFrame, del_keyed: DataFrame) -> DataFrame:
        """Remove keys (re-crawl scheduling): deleted urls probe as
        unseen again and get re-enqueued on their next discovery."""
        return (
            cuckoo_df.groupBy("bucket")
            .cogroup(del_keyed.select("bucket", "url_hash").groupBy("bucket"))
            .applyInPandas(self._apply_bucket("delete"), CUCKOO_SCHEMA)
        )

    @staticmethod
    def probe(candidates: DataFrame, cuckoo_df: DataFrame,
              flag_col: str = "maybe_seen") -> DataFrame:
        """Same contract as ``PartitionedBloom.probe``: adds a
        ``maybe_seen`` flag; False is authoritative (no false negatives
        for inserted-and-not-deleted keys)."""
        out_schema = T.StructType(candidates.schema.fields + [
            T.StructField(flag_col, T.BooleanType(), False)
        ])
        cols = [f.name for f in candidates.schema.fields]

        def probe_bucket(_key, cand_pdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
            if cand_pdf.empty:
                return pd.DataFrame(columns=cols + [flag_col])
            if cdf.empty:
                flags = np.zeros(len(cand_pdf), dtype=bool)
            else:
                cf = CuckooFilter.from_bytes(cdf.iloc[0]["bits"])
                keys = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
                flags = cf.contains_many(keys)
            out = cand_pdf.copy()
            out[flag_col] = flags
            return out

        return (
            candidates.groupBy("bucket")
            .cogroup(cuckoo_df.groupBy("bucket"))
            .applyInPandas(probe_bucket, out_schema)
        )
