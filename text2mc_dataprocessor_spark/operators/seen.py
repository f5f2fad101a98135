"""Partitioned Bloom-filter URL-seen set.

Replaces the reference's O(n) linear scan per URL probe
(/root/reference/scraper/selenium_scraper.py:165-168) with a structure
that works at 10^10 URLs:

- The key space is split into ``n_buckets`` by ``pmod(xxhash64(url), P)``
  (hash computed JVM-side). Each bucket owns an independent Bloom bitmap
  sized for ``capacity`` keys at ``fpr`` — at 10^10 keys / 1% FPR that is
  ~12 GB of bits total, which is exactly why the filter is partitioned:
  no single task or broadcast ever holds more than one bucket
  (~12 GB / P).
- Build and incremental merge are *grouped-map Arrow UDFs*
  (``applyInPandas`` / cogrouped ``applyInPandas``): per bucket, numpy
  sets bits vectorized; merging a new key batch into an existing filter
  ORs onto the bucket's bitmap. No driver collect, no per-row Python.
- Probe is a cogrouped Arrow UDF too: candidate URLs are shuffled to
  their bucket, checked against that bucket's bitmap, and emerge with a
  ``maybe_seen`` flag. ``maybe_seen = false`` is authoritative (a Bloom
  filter has no false negatives); ``true`` candidates go through the
  exact ``left_anti`` join backstop against the seen table — so at scale
  the expensive anti-join shuffles only true-dupes + FPR·new, not every
  discovered URL.

The bitmaps live in an ordinary DataFrame ``(bucket int, n_bits long,
n_hashes int, n_keys long, bits binary)`` and are checkpointed through
the same snapshot layer as the frontier.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _h1h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Kirsch-Mitzenmacher double hashing from one 64-bit key."""
    h1 = keys.astype(np.int64).view(np.uint64)
    h2 = (h1 ^ (h1 >> np.uint64(33))) * _MIX | np.uint64(1)
    return h1, h2


def _positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    h1, h2 = _h1h2(keys)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def bloom_params(capacity: int, fpr: float) -> tuple[int, int]:
    n_bits = max(64, int(math.ceil(-capacity * math.log(fpr) / (math.log(2) ** 2))))
    n_bits = (n_bits + 7) // 8 * 8
    n_hashes = max(1, round(n_bits / max(capacity, 1) * math.log(2)))
    return n_bits, min(n_hashes, 16)


def _set_bits(bits: np.ndarray, keys: np.ndarray, n_bits: int, n_hashes: int) -> None:
    pos = _positions(keys, n_bits, n_hashes).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    pos = _positions(keys, n_bits, n_hashes)
    hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return hit.all(axis=0)


class PartitionedBloom:
    """Factory for the bloom DataFrame operations (all Arrow-batched)."""

    def __init__(self, n_buckets: int = 64, capacity_per_bucket: int = 100_000,
                 fpr: float = 0.01):
        self.n_buckets = n_buckets
        self.capacity_per_bucket = capacity_per_bucket
        self.fpr = fpr
        self.n_bits, self.n_hashes = bloom_params(capacity_per_bucket, fpr)

    # -- build / merge ------------------------------------------------------
    def empty(self, spark) -> DataFrame:
        n_bits, n_hashes = self.n_bits, self.n_hashes
        zeros = bytes(n_bits // 8)
        rows = [(b, n_bits, n_hashes, 0, zeros) for b in range(self.n_buckets)]
        return spark.createDataFrame(rows, BLOOM_SCHEMA)

    def build(self, keyed: DataFrame) -> DataFrame:
        """keyed: DataFrame with (bucket int, url_hash long)."""
        n_bits, n_hashes = self.n_bits, self.n_hashes
        n_buckets = self.n_buckets

        def one_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(n_bits // 8, dtype=np.uint8)
            keys = pdf["url_hash"].to_numpy(dtype=np.int64)
            _set_bits(bits, keys, n_bits, n_hashes)
            return pd.DataFrame(
                [(int(pdf["bucket"].iloc[0]), n_bits, n_hashes, len(pdf), bits.tobytes())],
                columns=["bucket", "n_bits", "n_hashes", "n_keys", "bits"],
            )

        built = (
            keyed.select("bucket", "url_hash")
            .groupBy("bucket")
            .applyInPandas(one_bucket, BLOOM_SCHEMA)
        )
        # keep empty buckets present so cogroups always find their bitmap
        return self._fill_missing(built)

    def _fill_missing(self, built: DataFrame) -> DataFrame:
        spark = built.sparkSession
        n_bits, n_hashes = self.n_bits, self.n_hashes
        zeros = bytes(n_bits // 8)
        all_buckets = spark.range(self.n_buckets).select(
            F.col("id").cast("int").alias("bucket"),
            F.lit(n_bits).alias("n_bits"),
            F.lit(n_hashes).alias("n_hashes"),
            F.lit(0).cast("long").alias("n_keys"),
            F.lit(zeros).alias("bits"),
        )
        return built.unionByName(
            all_buckets.join(built.select("bucket"), "bucket", "left_anti")
        )

    def merge(self, bloom_df: DataFrame, new_keyed: DataFrame) -> DataFrame:
        """OR a batch of new (bucket, url_hash) keys into the filter."""

        def merge_bucket(_key, bloom_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
            if bloom_pdf.empty:
                return bloom_pdf
            row = bloom_pdf.iloc[0]
            bits = np.frombuffer(row["bits"], dtype=np.uint8).copy()
            if not keys_pdf.empty:
                keys = keys_pdf["url_hash"].to_numpy(dtype=np.int64)
                _set_bits(bits, keys, int(row["n_bits"]), int(row["n_hashes"]))
            return pd.DataFrame(
                [(
                    int(row["bucket"]),
                    int(row["n_bits"]),
                    int(row["n_hashes"]),
                    int(row["n_keys"]) + len(keys_pdf),
                    bits.tobytes(),
                )],
                columns=["bucket", "n_bits", "n_hashes", "n_keys", "bits"],
            )

        return (
            bloom_df.groupBy("bucket")
            .cogroup(new_keyed.select("bucket", "url_hash").groupBy("bucket"))
            .applyInPandas(merge_bucket, BLOOM_SCHEMA)
        )

    # -- probe ----------------------------------------------------------------
    @staticmethod
    def probe(candidates: DataFrame, bloom_df: DataFrame,
              flag_col: str = "maybe_seen") -> DataFrame:
        """Add ``maybe_seen`` to candidates (must carry bucket + url_hash).

        Distributed cogroup — each task touches exactly one bucket's
        bitmap; nothing is broadcast or collected.
        """
        out_schema = T.StructType(candidates.schema.fields + [
            T.StructField(flag_col, T.BooleanType(), False)
        ])
        cols = [f.name for f in candidates.schema.fields]

        def probe_bucket(_key, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            if cand_pdf.empty:
                return pd.DataFrame(columns=cols + [flag_col])
            if bloom_pdf.empty:
                flags = np.zeros(len(cand_pdf), dtype=bool)
            else:
                row = bloom_pdf.iloc[0]
                bits = np.frombuffer(row["bits"], dtype=np.uint8)
                keys = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
                flags = _test_bits(bits, keys, int(row["n_bits"]), int(row["n_hashes"]))
            out = cand_pdf.copy()
            out[flag_col] = flags
            return out

        return (
            candidates.groupBy("bucket")
            .cogroup(bloom_df.groupBy("bucket"))
            .applyInPandas(probe_bucket, out_schema)
        )


def bloom_probe_batch(filter_row, keys: np.ndarray) -> np.ndarray:
    """Membership test of a key batch against one bucket's Bloom row —
    the default ``probe_batch`` for the fused dedup+probe below (the
    cuckoo variant plugs in ``operators.cuckoo.cuckoo_probe_batch``)."""
    bits = np.frombuffer(filter_row["bits"], dtype=np.uint8)
    return _test_bits(bits, keys, int(filter_row["n_bits"]), int(filter_row["n_hashes"]))


def dedup_and_split_new(candidates: DataFrame, seen_df: DataFrame,
                        bloom_df: DataFrame, dedup_order: list[str],
                        info: dict | None = None,
                        probe_batch=None) -> DataFrame:
    """First-occurrence dedup per url + Bloom probe fused into ONE
    bucket shuffle, then the exact ``left_anti`` backstop.

    ``bucket = pmod(xxhash64(url), P)`` is a function of ``url``, so
    every duplicate of a url lands in the same bucket task — the
    in-batch first-occurrence dedup (reference semantics: keep the row
    of the earliest (parent priority, DOM position) — selenium_scraper
    .py:165-175) can therefore run inside the same cogrouped-Arrow task
    that probes the bucket's Bloom bitmap, saving the separate
    ``groupBy(url)`` shuffle of the full candidate set. ``dedup_order``
    must be a total order (unique tie-breaker) over the candidate rows.

    candidates must carry (bucket, url_hash) + ``dedup_order`` columns.
    Output: one row per distinct url, NOT in the seen set.

    ``probe_batch``: (filter_row, keys)->bool[] membership test — the
    seen-set filter is pluggable (Bloom default; the deletable cuckoo
    variant via ``operators.cuckoo.cuckoo_probe_batch``). Both have no
    false negatives, so the exact-backstop contract is identical.
    """
    if probe_batch is None:
        probe_batch = bloom_probe_batch
    out_schema = candidates.schema
    cols = [f.name for f in out_schema.fields]

    def probe_bucket(_key, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        # first-occurrence dedup: stable ascending sort on the total
        # order, keep the first row per url
        cand_pdf = cand_pdf.sort_values(dedup_order, kind="stable")
        cand_pdf = cand_pdf.drop_duplicates("url", keep="first")
        if bloom_pdf.empty:
            flags = np.zeros(len(cand_pdf), dtype=bool)
        else:
            keys = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
            flags = np.asarray(probe_batch(bloom_pdf.iloc[0], keys), dtype=bool)
        out = cand_pdf.copy()
        out["maybe_seen"] = flags
        return out

    probe_schema = T.StructType(out_schema.fields + [
        T.StructField("maybe_seen", T.BooleanType(), False)
    ])
    probed = (
        candidates.groupBy("bucket")
        .cogroup(bloom_df.groupBy("bucket"))
        .applyInPandas(probe_bucket, probe_schema)
    ).persist()
    if info is not None:
        info.setdefault("persisted", []).append(probed)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = maybe.join(seen_df.select("url"), "url", "left_anti")
    return fresh.unionByName(checked)


def split_new_urls(candidates: DataFrame, seen_df: DataFrame, bloom_df: DataFrame,
                   url_col: str = "url", info: dict | None = None) -> DataFrame:
    """Rows of ``candidates`` whose ``url`` is NOT in the seen set.

    candidates must carry (bucket, url_hash). Bloom pre-filter first —
    'definitely new' skips the join; 'maybe seen' goes through the exact
    ``left_anti`` backstop (zero-false-negative contract tested in
    tests/test_seen.py).

    ``info`` (optional dict): the cached probe intermediate is appended
    to ``info["persisted"]`` so the caller can unpersist it once the
    round's state is materialized (long crawls must not leak storage).
    """
    # persist: both branches (fresh / maybe) consume the probe, and the
    # cogrouped Arrow probe is the expensive part — compute it once
    probed = PartitionedBloom.probe(candidates, bloom_df).persist()
    if info is not None:
        info.setdefault("persisted", []).append(probed)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = maybe.join(seen_df.select(url_col), url_col, "left_anti")
    return fresh.unionByName(checked)
