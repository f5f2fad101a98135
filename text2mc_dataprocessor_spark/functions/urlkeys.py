"""URL keying: host extraction, canonicalization, 64-bit hashing.

The reference dedups on the EXACT raw URL string with no
canonicalization (/root/reference/scraper/selenium_scraper.py:165-168),
so the engine's dedup key stays the raw ``url``. Canonical form and
hash are *additional* keyed columns (SURVEY §2.2 F1): the hash drives
Bloom bucketing and salted repartitioning; the canonical form is there
for analyses that want scheme/host-case-insensitive grouping and for
cross-crawl URL joins.

Everything here is JVM-side: ``canonical_url_col`` builds the full
RFC 3986 normalization (lowercase scheme/host, default-port strip,
fragment strip, dot-segment resolution) out of regex extraction and a
higher-order ``aggregate`` fold over path segments — whole-stage
codegen, zero Python in the per-URL hot path. ``canonicalize`` is the
plain-Python mirror (parity-tested case-for-case) kept for driver-side
use and as the readable spec of the semantics.
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


def _resolve_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, absolute paths only."""
    if not path.startswith("/"):
        return path
    out: list[str] = []
    for seg in path[1:].split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    p = "/" + "/".join(out)
    if (path.endswith("/.") or path.endswith("/..")) and not p.endswith("/"):
        p += "/"
    return p


def canonicalize(url: str) -> str:
    """Lower scheme+host, strip default port and fragment, resolve
    dot-segments, default path '/'. The plain-Python mirror of
    ``canonical_url_col`` (parity-tested)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url  # non-absolute input passes through untouched
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme in _DEFAULT_PORTS and netloc.endswith(_DEFAULT_PORTS[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORTS[scheme])]
    path = _resolve_dot_segments(parts.path) or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def canonical_url_col(url: Column | str) -> Column:
    """``canonicalize`` as a pure-JVM column expression — regex parts
    extraction + an ``aggregate`` fold over path segments for RFC 3986
    dot-segment removal. Stays inside whole-stage codegen; this is the
    form the per-URL hot path uses at crawl scale."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][\w+.-]*)://", 1))
    netloc = F.lower(F.regexp_extract(c, r"^[A-Za-z][\w+.-]*://([^/?#]*)", 1))
    netloc = (
        F.when(
            (scheme == "http") & netloc.endswith(":80"),
            F.substring(netloc, 1, F.length(netloc) - 3),
        )
        .when(
            (scheme == "https") & netloc.endswith(":443"),
            F.substring(netloc, 1, F.length(netloc) - 4),
        )
        .otherwise(netloc)
    )
    nofrag = F.substring_index(c, "#", 1)
    path = F.regexp_extract(nofrag, r"^[A-Za-z][\w+.-]*://[^/?#]*([^?#]*)", 1)
    # RFC 3986 §5.2.4 over '/'-split segments: '.' drops, '..' pops,
    # anything else (including '' from '//' or a trailing '/') appends —
    # the trailing empty segment is what preserves '/a/b/../' → '/a/'
    segs = F.slice(F.split(path, "/"), 2, F.greatest(
        F.size(F.split(path, "/")) - 1, F.lit(0)))
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..",
                  F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    rpath = F.concat(F.lit("/"), F.array_join(folded, "/"))
    rpath = F.when(
        (path.endswith("/.") | path.endswith("/..")) & ~rpath.endswith("/"),
        F.concat(rpath, F.lit("/")),
    ).otherwise(rpath)
    rpath = F.when(path == "", F.lit("/")).otherwise(rpath)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    rebuilt = F.concat(
        scheme, F.lit("://"), netloc, rpath,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    # non-absolute input (no scheme://netloc) passes through untouched
    return F.when((scheme == "") | (netloc == ""), c).otherwise(rebuilt)


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(url: pd.Series) -> pd.Series:
    """Arrow-batched fallback mirror (kept for parity tests and callers
    that canonicalize outside a Spark plan)."""
    return url.map(lambda u: canonicalize(u) if u is not None else None)


def with_url_keys(df, url_col: str = "url", n_buckets: int = 64):
    """Add host / url_canon / url_hash / bucket columns — all JVM-side."""
    return (
        df.withColumn("host", host_col(url_col))
        .withColumn("url_canon", canonical_url_col(url_col))
        .withColumn("url_hash", url_hash_col(url_col))
        .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
    )
