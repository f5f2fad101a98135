"""Document deduplication suite — exact and near-dup, built for the
training-data pipeline the engine feeds (first-class per the build
brief; the crawl's URL dedup lives in operators/seen.py).

- ``exact_dedup``            hash-groupBy on content (or md5 digest for
                             wide rows), keep first occurrence by seq.
- ``minhash_lsh_pairs``      shingle → minhash (vectorized numpy over
                             Arrow batches) → banded LSH bucket join →
                             candidate pairs with exact Jaccard verify.
- ``simhash_pairs``          64-bit simhash over token hashes; pairs
                             whose signatures agree on all bands of a
                             banded split (Hamming pre-filter) then
                             exact Hamming distance check.
- ``ngram_jaccard_pairs``    exact n-gram Jaccard via token-set explode
                             + self-join on shared shingles (pure
                             relational: |A∩B| from a groupBy, sizes
                             joined in — no cross join).
- ``embedding_near_dup``     cosine-threshold near-dup via the LSH path
                             in operators/similarity.py.

Scale notes: every path generates candidates by equi-join on small keys
(shingle hash, band signature) — never a cross join; minhash signatures
travel as ``array<bigint>`` columns; all Python work is Arrow-batched
``pandas_udf`` over numpy (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, content_col: str = "text", seq_col: str = "doc_id") -> DataFrame:
    """First-occurrence exact dedup: one row per distinct content with
    its minimal seq and the duplicate count (selenium_scraper.py:165-175
    generalized from URLs to documents)."""
    return df.groupBy(content_col).agg(
        F.min(seq_col).alias("first_seq"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    toks = text.split(" ")
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    # Python's str hash is salted per-process → use a stable FNV-1a
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = np.uint64(0xCBF29CE484222325)
        for ch in g.encode("utf-8"):
            h = (h ^ np.uint64(ch)) * np.uint64(0x100000001B3)
        out[i] = h
    return out


def minhash_signature_udf(n_hashes: int = 64, shingle_n: int = 3, seed: int = 13):
    a, b = _minhash_params(n_hashes, seed)
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(text: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return [0] * n_hashes
            sh = _shingle_hashes(t, shingle_n) % np.uint64(_MERSENNE)
            # (a*x + b) mod p for all hash fns at once: (H, S) matrix
            vals = (au[:, None] * sh[None, :] + bu[:, None]) % np.uint64(_MERSENNE)
            return vals.min(axis=1).astype(np.int64).tolist()

        return text.map(one)

    return sig


def with_minhash(df: DataFrame, text_col: str = "text", n_hashes: int = 64,
                 shingle_n: int = 3, seed: int = 13, out: str = "minhash") -> DataFrame:
    return df.withColumn(out, minhash_signature_udf(n_hashes, shingle_n, seed)(F.col(text_col)))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 13,
) -> DataFrame:
    """→ (id_a, id_b, est_jaccard) candidate near-dup pairs.

    Banded LSH: a pair is a candidate iff some band of rows/band minhash
    values matches exactly; est_jaccard = fraction of agreeing minhashes
    (unbiased Jaccard estimator) filtered at ``threshold``.
    """
    rows_per_band = n_hashes // bands
    sigged = with_minhash(df, text_col, n_hashes, shingle_n, seed).select(
        F.col(id_col).alias("id"), "minhash"
    )
    banded = sigged.select(
        "id",
        "minhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(
                            *[
                                F.element_at("minhash", bi * rows_per_band + j + 1)
                                for j in range(rows_per_band)
                            ]
                        ).alias("bkey"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "minhash", "bk.band", "bk.bkey")

    left = banded.select(
        F.col("id").alias("id_a"), F.col("minhash").alias("mh_a"), "band", "bkey"
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("minhash").alias("mh_b"), "band", "bkey"
    )
    pairs = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")), lambda v: v == 1
        )
    )
    est = agree.cast("double") / F.lit(n_hashes)
    return (
        pairs.select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash (text)
# ---------------------------------------------------------------------------

def simhash_udf(seed: int = 29):
    @F.pandas_udf(T.LongType())
    def sig(text: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return 0
            acc = np.zeros(64, dtype=np.int64)
            for tok in t.split(" "):
                h = np.uint64(0xCBF29CE484222325 ^ seed)
                for ch in tok.encode("utf-8"):
                    h = (h ^ np.uint64(ch)) * np.uint64(0x100000001B3)
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            out = np.uint64(0)
            for i in range(64):
                if acc[i] > 0:
                    out |= np.uint64(1) << np.uint64(i)
            return int(out.astype(np.int64))

        return text.map(one)

    return sig


def simhash_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, n_bands: int = 4, seed: int = 29) -> DataFrame:
    """→ (id_a, id_b, hamming). Pigeonhole banding: if two 64-bit
    signatures differ in ≤ max_hamming < n_bands bits, they agree on at
    least one 16-bit band → candidates from band equi-joins only."""
    sigged = df.select(F.col(id_col).alias("id"), simhash_udf(seed)(F.col(text_col)).alias("sh"))
    width = 64 // n_bands
    banded = sigged.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("sh", bi * width).bitwiseAND(
                            F.lit((1 << width) - 1)
                        ).alias("bkey"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.bkey")
    left = banded.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "bkey")
    right = banded.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "bkey")
    pairs = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (pure relational)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """→ (id_a, id_b, jaccard) for pairs sharing ≥1 shingle.

    |A∩B| via groupBy on (id_a, id_b) over the shingle equi-join;
    |A∪B| = |A|+|B|−|A∩B|. No UDF, no cross join; hot shingles are the
    skew point — AQE skew-join handles, or pre-filter stopword shingles.
    """
    toks = F.split(F.col(text_col), " ")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ).alias("gram"),
    ).distinct()
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.select(F.col("id").alias("id_a"), "gram")
    b = grams.select(F.col("id").alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def embedding_near_dup(df: DataFrame, dim: int, threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Cosine near-dup pairs via the simhash-LSH candidate path."""
    from .similarity import cosine_topk_lsh

    topk = cosine_topk_lsh(df, df, dim=dim, k=20, id_col=id_col, vec_col=vec_col)
    return (
        topk.filter((F.col("cos_sim") >= threshold) & (F.col("qid") < F.col("vec_id")))
        .select(F.col("qid").alias("id_a"), F.col("vec_id").alias("id_b"), "cos_sim")
    )
