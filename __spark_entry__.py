"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: synthesize a detail-page table from the
sf0.001 ``documents`` parquet and run the reference-semantics HTML
extraction UDF (the engine's per-row byte-identity operator).

``queries()`` / ``oracle_sql()`` — the SQL-expressible operator
inventory from SURVEY.md §2 plus the training-data ops (dedup /
similarity / text analysis), implemented in
``text2mc_dataprocessor_spark.queries`` with matching DuckDB oracles.
Near-dup operators whose hash pipelines are not expressible in ANSI SQL
(MinHash-LSH, SimHash, LSH-ANN) are registered without oracles —
rows-only driver check; their semantics are verified against
brute-force baselines in tests/test_dedup.py and tests/test_similarity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship(spark: SparkSession) -> None:
    """Ship the package to Python workers (the driver may run this from
    any cwd on a session it built itself — local-mode --py-files analog)."""
    from text2mc_dataprocessor_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship(spark)
    from text2mc_dataprocessor_spark.queries import crawl_extract_detail

    return crawl_extract_detail(spark, "/root/testdata/sf0.001")


def _minhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text2mc_dataprocessor_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, threshold=0.5)


def _simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from text2mc_dataprocessor_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(docs, max_hamming=8)


def _lsh_ann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.operators.similarity import cosine_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk_lsh(emb, queries, dim=64, k=5)


def _ivf_ann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: MLlib-kmeans coarse quantizer, n_probe/n_lists scan
    fraction, exact re-rank. Rows-only here; recall vs brute force is
    asserted in tests/test_similarity.py."""
    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.operators.similarity import cosine_topk_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk_ivf(emb, queries, k=5, n_lists=8, n_probe=3)


def _crawl_round_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl rounds on the deterministic fixture corpus:
    returns the final extracted table (byte-identity asserted in pytest;
    here the driver records rows + schema stability)."""
    import tempfile

    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        generate_corpus,
        pages_to_spark,
        seeds_to_spark,
    )

    corpus = generate_corpus(n_hosts=2, listing_pages_per_host=2, links_per_listing=4, seed=42)
    workdir = tempfile.mkdtemp(prefix="crawl_round_q_")
    eng = CrawlEngine(
        spark,
        workdir,
        pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=8, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()
    return eng.extracted_df()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from text2mc_dataprocessor_spark.queries import register_all

    q, _ = register_all()
    q["minhash_lsh_pairs"] = _minhash_pairs_q
    q["simhash_pairs"] = _simhash_pairs_q
    q["cosine_topk_lsh"] = _lsh_ann_q
    q["cosine_topk_ivf"] = _ivf_ann_q
    q["crawl_rounds_extracted"] = _crawl_round_q

    def with_ship(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", "query")
        return wrapped

    return {name: with_ship(fn) for name, fn in q.items()}


def oracle_sql() -> dict[str, str]:
    from text2mc_dataprocessor_spark.queries import register_all

    _, sql = register_all()
    return sql
