"""Preprocess operators: reference-regex fidelity (Python re ≡ Spark
Java regex ≡ RE2-safe oracle form), splitext semantics, pipeline vs a
pandas re-implementation, tags round-trip."""

import os
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators import preprocess as P

URLS = [
    "https://static.planetminecraft.com/files/b12.zip",
    "https://static.planetminecraft.com/files/b13.rar?X-Sig=9&x=1",
    "https://h.example/a/b.zip/c.schem",
    "https://h.example/deep/path/build.schematic",  # ext >4 chars: regex P7 misses it
    "https://h.example/no-extension/",
    "https://download1472.mediafire.com/dl/thing.zip?tok=a.b",
    "https://h.example/x.zip?y=z.rar",
    "https://h.example/weird&name.zip",
    "https://h.example/a.tar.gz",
]


def test_filename_regex_matches_python_re(spark):
    """Spark (Java lookahead regex, the reference's exact pattern) must
    agree with Python re.search (the reference implementation,
    filter_projects_dataframe.ipynb cell-2)."""
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = {
        r.url: r.fn
        for r in df.select("url", P.filename_from_url("url").alias("fn")).collect()
    }
    for u in URLS:
        m = re.search(P.FILENAME_REGEX, u)
        want = m.group() if m else None
        assert got[u] == want, (u, got[u], want)


def test_filename_regex_re2_equivalent(spark):
    """The RE2-safe anchored form used in DuckDB oracles must agree with
    the lookahead form on realistic URLs."""
    import duckdb

    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = {
        r.url: (r.fn or "")
        for r in df.select("url", P.filename_from_url("url").alias("fn")).collect()
    }
    con = duckdb.connect()
    for u in URLS:
        re2 = con.execute(
            "SELECT regexp_extract(?, '([^/\\\\&\\?]+\\.\\w{3,4})([\\?&][^/]*)?$', 1)", [u]
        ).fetchone()[0]
        assert re2 == got[u], (u, re2, got[u])


def test_suffix_matches_splitext(spark):
    names = [
        "a.zip", "b.schematic", "c.tar.gz", "noext", ".hidden",
        "x.zip?y=1", "dir.name",
    ]
    df = spark.createDataFrame([(n,) for n in names], "fn string")
    got = {r.fn: r.sfx for r in df.select("fn", P.suffix_of("fn").alias("sfx")).collect()}
    for n in names:
        assert got[n] == os.path.splitext(n)[-1], n


def test_pipeline_matches_pandas_reference(spark):
    """preprocess_pipeline == the reference's preprocess_csv chain
    (preprocess.py:46-73) re-implemented in pandas."""
    rng = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(200)],
            "raw_download_link": [
                None if i % 5 == 0 else f"https://cdn/files/f{i}{ext}"
                for i, ext in zip(
                    range(200),
                    [[".zip", ".rar", ".schem", ".schematic", ".txt", ".nbt", ".litematic"][i % 7] for i in range(200)],
                )
            ],
            "download_size": [(i * 104729) % 80_000_000 for i in range(200)],
        }
    )
    on_disk = pd.DataFrame({"filename": [f"f{i}.zip" for i in range(0, 200, 2)]})

    # pandas reference
    ref = rng.dropna(subset=["raw_download_link"]).copy()
    ref["filename"] = ref["raw_download_link"].map(lambda x: os.path.split(x)[-1])
    ref = ref[ref["download_size"] <= 50_000_000]
    ref["suffix"] = ref["filename"].map(lambda x: os.path.splitext(x)[-1])
    ref = ref[ref["suffix"].isin([".zip", ".rar", ".schematic", ".schem"])]
    ref = ref[ref["filename"].isin(set(on_disk.filename))]

    got = (
        P.preprocess_pipeline(
            spark.createDataFrame(rng), spark.createDataFrame(on_disk)
        )
        .select("url", "filename", "suffix", "download_size")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = ref[["url", "filename", "suffix", "download_size"]].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tags_parse_serialize_round_trip(spark):
    vals = ["['Fantasy', 'City Build']", "[]", "['One']", None, "not a list"]
    df = spark.createDataFrame([(v,) for v in vals], "tags string")
    out = df.select(
        "tags",
        P.parse_tags_udf("tags").alias("arr"),
    ).withColumn("back", P.serialize_tags("arr"))
    got = {r.tags: (list(r.arr), r.back) for r in out.collect()}
    assert got["['Fantasy', 'City Build']"] == (
        ["Fantasy", "City Build"],
        "['Fantasy', 'City Build']",
    )
    assert got["[]"] == ([], "[]")
    assert got["['One']"] == (["One"], "['One']")
    assert got[None][0] == []
    assert got["not a list"][0] == []


def test_top_tags_drops_first(spark):
    rows = [("['a', 'b']",)] * 5 + [("['b']",)] * 3 + [("['c']",)] * 2
    df = spark.createDataFrame(rows, "tags string")
    out = P.top_tags(df, k=30).toPandas()
    # 'b' (8) is #1 → dropped; 'a' (5) rank 2, 'c' (2) rank 3
    assert list(out.tag) == ["a", "c"]
    assert list(out.n) == [5, 2]


def test_iqr_outlier_bounds(spark):
    vals = list(range(1, 101)) + [10_000]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = P.remove_outliers(df, "x").toPandas()
    assert 10_000 not in set(out.x)
    assert len(out) == 100

    s = pd.Series([float(v) for v in vals])
    q1, q3 = s.quantile(0.25), s.quantile(0.75)
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    want = s[(s >= lo) & (s <= hi)]
    assert sorted(out.x) == sorted(want)
