"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: synthesize a detail-page table from the
sf0.001 ``documents`` parquet and run the reference-semantics HTML
extraction UDF (the engine's per-row byte-identity operator).

``queries()`` / ``oracle_sql()`` — the SQL-expressible operator
inventory from SURVEY.md §2 plus the training-data ops (dedup /
similarity / text analysis), implemented in
``text2mc_dataprocessor_spark.queries`` with matching DuckDB oracles.
Every registered query has an oracle: operators whose hash pipelines
are not ANSI-SQL-expressible (MinHash-LSH, SimHash, LSH/IVF-ANN, the
crawl loop) are checked against planted known-signature pair sets,
recall-floor constants, or constant VALUES captures of their
deterministic fixtures (see their docstrings in queries.py); their
full semantics are additionally verified against brute-force baselines
in tests/test_dedup.py and tests/test_similarity.py.
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from text2mc_dataprocessor_spark.queries import register_all

    q, _ = register_all()

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
