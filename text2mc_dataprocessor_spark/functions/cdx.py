"""CDXJ URL-index lines + SURT keys — the WARC companion index.

Common Crawl (and every wayback-style archive) indexes WARC captures as
CDXJ lines::

    <urlkey> <timestamp> <json>
    com,example)/path?q=1 20240301100000 {"url": "...", "length": "1234"}

- ``urlkey`` is the SURT form (Sort-friendly URI Reordering
  Transform): lowercase host with its dot-components REVERSED and
  comma-joined, then ``)`` and the lowercased path+query, fragment
  dropped — so a lexicographic sort clusters captures by registered
  domain, then host, then path. That makes SURT the natural Spark
  sort/bucket/range-partition key for URL indexes at archive scale.
- ``timestamp`` is ``yyyyMMddHHmmss``.
- the JSON carries free-form capture metadata.

Everything here is JVM-side column expressions (regex + concat +
to_json / get_json_object) — index emission and parsing are per-capture
hot paths."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key_col(url: Column | str) -> Column:
    """URL → SURT urlkey. Lowercased; fragment dropped; empty path →
    ``/``. Non-absolute input yields '' (callers filter). Port kept
    as-is after the host (wayback keeps ``:8080`` in the host part)."""
    c = F.col(url) if isinstance(url, str) else url
    nofrag = F.lower(F.substring_index(c, "#", 1))
    host = F.regexp_extract(nofrag, r"^[a-z][\w+.-]*://(?:[^@/?#]*@)?([^/?#:]*)", 1)
    port = F.regexp_extract(nofrag, r"^[a-z][\w+.-]*://[^/?#:]*(:[0-9]+)", 1)
    rest = F.regexp_extract(nofrag, r"^[a-z][\w+.-]*://[^/?#]*(.*)$", 1)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    key = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        port, F.lit(")"), rest,
    )
    # the CDXJ line format is space-delimited — a literal space in the
    # path (technically illegal per RFC 3986, but crawls see them) must
    # be %20 in the key or the line misparses (wayback does the same)
    key = F.regexp_replace(key, " ", "%20")
    return F.when(host == "", F.lit("")).otherwise(key)


def cdxj_lines(df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
               meta_cols: tuple[str, ...] = ()) -> DataFrame:
    """(url, ts, meta…) → one CDXJ line per row (``line`` string
    column, plus ``urlkey`` kept for sorting/bucketing). Write sorted
    by urlkey for the archive's lexicographic-cluster property:
    ``df.repartitionByRange('urlkey').sortWithinPartitions('urlkey')``."""
    meta = F.to_json(
        F.struct(F.col(url_col).alias("url"),
                 *[F.col(m).cast("string").alias(m) for m in meta_cols])
    )
    return df.select(
        surt_key_col(url_col).alias("urlkey"),
        F.concat(
            surt_key_col(url_col), F.lit(" "),
            F.date_format(ts_col, "yyyyMMddHHmmss"), F.lit(" "),
            meta,
        ).alias("line"),
    )


def parse_cdxj(df: DataFrame, line_col: str = "line",
               meta_fields: tuple[str, ...] = ()) -> DataFrame:
    """CDXJ lines → (urlkey, ts, url, meta…). ``ts`` comes back as a
    timestamp; unknown meta fields are NULL."""
    line = F.col(line_col)
    # the json may itself contain spaces — take everything after the
    # second space, not a substring_index last-token shortcut
    json = F.regexp_extract(line, r"^\S+ \S+ (.*)$", 1)
    out = df.select(
        F.regexp_extract(line, r"^(\S+)", 1).alias("urlkey"),
        F.to_timestamp(
            F.regexp_extract(line, r"^\S+ (\S+)", 1), "yyyyMMddHHmmss"
        ).alias("ts"),
        F.get_json_object(json, "$.url").alias("url"),
        *[F.get_json_object(json, f"$.{m}").alias(m) for m in meta_fields],
    )
    return out
