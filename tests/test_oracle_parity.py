"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row-count, column names, and order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False,
                                  rtol=1e-6, atol=1e-9)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.count() > 0
    assert set(df.columns) == {"url", "tags", "image_url", "download_url", "extracted_text"}
    assert all(r.extracted_text.count("\x1f") == 3 for r in rows)


def test_rows_only_queries_run(spark):
    """Queries without oracles still run and return stable schemas."""
    qs = entry_mod.queries()
    for name in ["minhash_lsh_pairs", "simhash_pairs", "cosine_topk_lsh",
                 "cosine_topk_ivf"]:
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.columns) >= 3
