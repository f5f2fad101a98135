"""text2mc_dataprocessor_spark — a from-scratch PySpark-native crawl
frontier + fetch scheduler with the query/data-processing capabilities
of shauncomino/text2mc-dataprocessor (reference studied read-only at
/root/reference; semantics cited per-module, no code copied).

Architecture (Spark-first, see SURVEY.md):

- ``sources.snapshots``   Iceberg-style snapshot tables (atomic manifest
                          commits, VERSION AS OF, rollback) over Parquet.
- ``sources.fixtures``    deterministic Common-Crawl-style ``pages`` table
                          generator (url, warc_ts, html, text, lang).
- ``functions.htmlparse`` selenium-semantics mini-DOM used by extraction.
- ``functions.extract``   vectorized pandas UDFs: listing outlinks, detail
                          page fields, raw download link (byte-identical
                          to the reference scraper per url).
- ``functions.urlkeys``   canonicalization + xxhash64 keying + host.
- ``operators.seen``      partitioned Bloom-filter URL-seen set (cogroup
                          probe, exact anti-join backstop).
- ``operators.cuckoo``    deletable cuckoo-filter variant.
- ``operators.frontier``  window-ranked priority dequeue w/ politeness.
- ``plans.crawl``         the round loop: dequeue → fetch → extract →
                          dedup → merge → snapshot; lineage + metrics;
                          resume from any snapshot.
- ``plans.oracle``        pure-Python reference-semantics simulator used
                          as the conformance oracle in tests.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
