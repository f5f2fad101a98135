"""Post-crawl filter/report pipeline — the Spark re-expression of
/root/reference/scraper/preprocess.py and
scraper/filter_projects_dataframe.ipynb (SURVEY §2 operators F3-F5,
F12-F13, P7-P9, A1-A3, T5-T6, J2).

Everything here is built-in Catalyst expressions (JVM, codegen) except
``parse_tags_udf`` (Python ``ast.literal_eval`` semantics for the
reference's str(list) tag serialization — an Arrow-batched pandas UDF).
"""

from __future__ import annotations

from ast import literal_eval

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# P7 — regex filename extraction (filter_projects_dataframe.ipynb cell-2).
# Java regex supports the reference's lookahead verbatim.
FILENAME_REGEX = r"[^/\\&\?]+\.\w{3,4}(?=([\?&].*$|$))"
# RE2-safe equivalent (for DuckDB oracles): anchored optional query tail.
FILENAME_REGEX_RE2 = r"([^/\\&\?]+\.\w{3,4})([\?&][^/]*)?$"

ALLOWED_SUFFIXES = [".zip", ".rar", ".schematic", ".schem"]  # F5, preprocess.py:59-65
SIZE_CAP = 50_000_000  # F4, preprocess.py:52


def filename_from_url(url: Column | str) -> Column:
    """P7 — first token that looks like 'name.ext' followed only by an
    optional query tail. NULL when no match (reference matcher → None)."""
    c = F.col(url) if isinstance(url, str) else url
    m = F.regexp_extract(c, FILENAME_REGEX, 0)
    return F.when(m == "", F.lit(None)).otherwise(m)


def basename_from_url(url: Column | str) -> Column:
    """P7 variant — preprocess.py:48-50 uses os.path.split instead."""
    c = F.col(url) if isinstance(url, str) else url
    return F.element_at(F.split(c, "/"), -1)


def suffix_of(filename: Column | str) -> Column:
    """P8 — os.path.splitext(x)[-1] semantics: last-dot extension, ''
    when there is no dot or the name is a pure leading-dot file."""
    c = F.col(filename) if isinstance(filename, str) else filename
    ext = F.regexp_extract(c, r"(\.[^./\\]+)$", 1)
    # splitext('.hidden') → ('', '.hidden'): a leading-dot-only name has
    # no extension
    return F.when(F.regexp_extract(c, r"^\.?[^.]*$", 0) != "", F.lit("")).otherwise(ext)


@F.pandas_udf(T.ArrayType(T.StringType()))
def parse_tags_udf(tags: pd.Series) -> pd.Series:
    """P9 — ast.literal_eval of the reference's str(list) serialization
    (preprocess.py:158-160)."""

    def one(s):
        if s is None or s == "":
            return []
        try:
            v = literal_eval(s)
            return [str(x) for x in v] if isinstance(v, list) else []
        except (ValueError, SyntaxError):
            return []

    return tags.map(one)


def serialize_tags(tags_array: Column | str) -> Column:
    """Inverse of P9 — canonical Python str(list) bytes, JVM-side:
    ``['a', 'b']`` (reference serialization, selenium_scraper.py:441)."""
    c = F.col(tags_array) if isinstance(tags_array, str) else tags_array
    inner = F.array_join(
        F.transform(c, lambda t: F.concat(F.lit("'"), t, F.lit("'"))), ", "
    )
    return F.concat(F.lit("["), inner, F.lit("]"))


def preprocess_pipeline(
    artifacts: DataFrame,
    files_on_disk: DataFrame | None = None,
    raw_link_col: str = "raw_download_link",
    size_col: str = "download_size",
) -> DataFrame:
    """The full preprocess_csv() chain (preprocess.py:46-73):
    F3 dropna(raw link) → P7 filename → F4 size cap → P8 suffix →
    F5 whitelist → J2 semi-join against downloaded files."""
    out = (
        artifacts.filter(F.col(raw_link_col).isNotNull())  # F3
        .withColumn("filename", basename_from_url(raw_link_col))  # P7 (os.path.split)
        .filter(F.col(size_col) <= SIZE_CAP)  # F4 (NULL sizes drop, as in pandas <=)
        .withColumn("suffix", suffix_of("filename"))  # P8
        .filter(F.col("suffix").isin(ALLOWED_SUFFIXES))  # F5
    )
    if files_on_disk is not None:  # J2 — broadcast the small file list
        out = out.join(F.broadcast(files_on_disk), "filename", "left_semi")
    return out


def suffix_distribution(df: DataFrame, suffix_col: str = "suffix") -> DataFrame:
    """A1 — value_counts(normalize=True)*100 (preprocess.py:87-89):
    map-side partial agg then a single tiny window over the group rows."""
    counts = df.groupBy(suffix_col).agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.select(
        suffix_col,
        (F.col("n") * 100.0 / F.sum("n").over(total)).alias("pct"),
    )


def iqr_bounds(df: DataFrame, col: str) -> tuple[float, float]:
    """F12 — exact quartiles (pandas .quantile default linear interp ==
    Spark `percentile` == DuckDB quantile_cont)."""
    q = df.select(
        F.expr(f"percentile({col}, 0.25)").alias("q1"),
        F.expr(f"percentile({col}, 0.75)").alias("q3"),
    ).first()
    iqr = q.q3 - q.q1
    return q.q1 - 1.5 * iqr, q.q3 + 1.5 * iqr


def remove_outliers(df: DataFrame, col: str) -> DataFrame:
    """F12 — keep rows within [Q1−1.5·IQR, Q3+1.5·IQR] (preprocess.py:185-191).
    Scalar bounds are computed once and folded into the scan filter —
    no join, fully pushed down."""
    lo, hi = iqr_bounds(df, col)
    return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))


def tag_frequencies(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """A2 — flatten str(list) tags and count (preprocess.py:163-166)."""
    return (
        df.select(F.explode(parse_tags_udf(F.col(tags_col))).alias("tag"))
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def top_tags(df: DataFrame, tags_col: str = "tags", k: int = 30) -> DataFrame:
    """T5 — head(30)[1:]: top-k by count then drop the #1 row
    (preprocess.py:166-170). Ties broken by tag for determinism."""
    from .frontier import with_global_rank

    ranked = with_global_rank(
        tag_frequencies(df, tags_col), [F.col("n").desc(), F.col("tag")], out="rank"
    )
    return (
        ranked.filter((F.col("rank") > 1) & (F.col("rank") <= k))
        .select("tag", "n", F.col("rank").cast("int").alias("rank"))
    )


def top_suffixes(df: DataFrame, suffix_col: str = "suffix", k: int = 9) -> DataFrame:
    """T6 — ``file_type_counts[0:9]`` (preprocess.py:93): top-k suffixes
    by count, #1 KEPT (unlike T5's drop-first). Ties broken by suffix for
    determinism. Same two-phase distributed rank as T5 — counts are one
    map-side partial agg over the suffix column, the rank never funnels
    through a single partition."""
    from .frontier import with_global_rank

    counts = df.groupBy(suffix_col).agg(F.count(F.lit(1)).alias("n"))
    ranked = with_global_rank(
        counts, [F.col("n").desc(), F.col(suffix_col)], out="rank"
    )
    return ranked.filter(F.col("rank") <= k).select(
        suffix_col, "n", F.col("rank").cast("int").alias("rank")
    )
