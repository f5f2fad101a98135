"""S3 — CSV checkpoint source (and interop sink).

The reference's durable state is ``projects.csv``, loaded with pandas
``read_csv`` and immediately stripped of the ``Unnamed: 0``-style index
columns that pandas ``to_csv(index=True)`` leaves behind
(/root/reference/scraper/selenium_scraper.py:106-118). The engine's
native durable state is the snapshot table (sources/snapshots.py) —
this module is the *format boundary*: read a reference-produced CSV
checkpoint into a DataFrame (to seed a frontier or resume a reference
crawl under this engine), and export back to the reference's CSV shape.

Scale notes:
- ``multiline=True`` is required for reference interop (description
  fields contain quoted newlines) but makes the file NON-SPLITTABLE —
  one task per file. That is correct for checkpoint-sized CSVs (the
  reference's frontier is 44k rows); for bulk CSV corpora pass
  ``multiline=False`` and Spark splits the scan by byte range.
- The sink writes a directory of part files (the parallel, 100 TB-safe
  form). ``single_file=True`` coalesces to one part for byte-level
  reference interop — only for small checkpoint exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: pandas ``to_csv(index=True)`` emits its index as an empty-named or
#: ``Unnamed: N`` header; the reference drops these on every load.
_UNNAMED_PREFIX = "Unnamed"


def read_checkpoint_csv(spark: SparkSession, path: str, schema=None,
                        multiline: bool = True) -> DataFrame:
    """Load a reference-style CSV checkpoint: header row, pandas quoting
    (``"`` escaped by doubling), index columns dropped. With no
    ``schema`` all columns arrive as strings (pandas-compatible: the
    engine's typed frontier casts explicitly downstream)."""
    reader = (
        spark.read.option("header", True)
        .option("escape", '"')          # pandas doubles quotes; Spark's
        .option("multiLine", multiline)  # default escape is backslash
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    unnamed = [c for c in df.columns if c.startswith(_UNNAMED_PREFIX) or c == "_c0"]
    return df.drop(*unnamed) if unnamed else df


def write_checkpoint_csv(df: DataFrame, path: str,
                         single_file: bool = False) -> None:
    """Export to the reference's CSV shape (header, quote-doubling).
    Directory-of-parts by default; ``single_file=True`` only for small
    checkpoint interop (serializes the write through one task)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )
