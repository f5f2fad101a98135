"""URL keying: host extraction, canonicalization, 64-bit hashing.

The reference dedups on the EXACT raw URL string with no
canonicalization (/root/reference/scraper/selenium_scraper.py:165-168),
so the engine's dedup key stays the raw ``url``. Canonical form and
hash are *additional* keyed columns (SURVEY §2.2 F1): the hash drives
Bloom bucketing and salted repartitioning; the canonical form is there
for analyses that want scheme/host-case-insensitive grouping.

Everything here is JVM-side (``parse_url``, ``xxhash64``, string
builtins) except ``canonicalize_url``, which is an Arrow-batched pandas
UDF (urllib semantics are not expressible with builtins alone).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def host_col(url: Column | str) -> Column:
    """Lower-cased netloc — pure JVM (`parse_url`), codegen-friendly."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(c, F.lit("HOST")))


def url_hash_col(url: Column | str) -> Column:
    """64-bit key for Bloom bucketing / salting — JVM xxhash64."""
    c = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(c)


def bucket_col(url: Column | str, n_buckets: int) -> Column:
    return F.pmod(url_hash_col(url), F.lit(n_buckets)).cast("int")


def canonicalize(url: str) -> str:
    """Lower scheme+host, strip default port and fragment, default path '/'."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme in _DEFAULT_PORTS and netloc.endswith(_DEFAULT_PORTS[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORTS[scheme])]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: canonicalize(u) if u is not None else None)


def with_url_keys(df, url_col: str = "url", n_buckets: int = 64):
    """Add host / url_canon / url_hash / bucket columns."""
    return (
        df.withColumn("host", host_col(url_col))
        .withColumn("url_canon", canonicalize_url_udf(F.col(url_col)))
        .withColumn("url_hash", url_hash_col(url_col))
        .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
    )
