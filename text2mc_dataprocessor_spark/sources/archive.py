"""S8 — archive (zip) source + the unzip-and-move ETL naming pass.

Reference: /root/reference/scraper/unzip_and_move_build_files.py — a
sequential driver loop that, per downloaded artifact row i (in row
order, counter ``j`` starting at 0):

- ``*.zip``  → ``ZipFile(path).extractall(build-{j}/)``, NEW_FILENAME =
  ``build-{j}``, j += 1
- ``*.rar``  → patoolib extraction, same naming (rar codec is NOT in
  this container: the engine surfaces these rows with an error marker
  instead of entries — the naming pass still assigns their
  NEW_FILENAME exactly as the reference does)
- otherwise (``.schem``/``.schematic``) → file copied as
  ``build-{j}.{suffix}`` where ``suffix = os.path.splitext(file)[-1]``
  ALREADY contains the leading dot — the reference therefore writes a
  double dot (``build-7..schem``). Preserved byte-for-byte.
- any exception → row keeps NEW_FILENAME NULL and ``j`` is NOT
  incremented (the reference skips the increment on error).

Spark re-expression: extraction is a ``mapInPandas`` pass with stdlib
``zipfile`` over in-memory bytes (one archive per row, entries exploded;
X4 per-row isolation: a corrupt archive yields one error row, never a
task failure), and the sequential ``j`` counter becomes a distributed
rank over successful rows in row order — identical final state without
a driver-side loop.

Scale notes: archive payloads are capped upstream at 50 MB (F4), so a
single archive always fits one Arrow batch; entries stream out batch by
batch and never concentrate on the driver. The rank in
``assign_new_filenames`` is the same two-phase distributed rank used by
the frontier (no single-partition window).
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ARCHIVE_ENTRY_SCHEMA = (
    "row_idx long, entry_name string, entry_bytes binary, "
    "entry_size long, error string"
)

#: suffixes routed to the archive-extraction branch
ZIP_SUFFIX = ".zip"
RAR_SUFFIX = ".rar"


def unzip_entries(df: DataFrame, bin_col: str = "content",
                  idx_col: str = "row_idx") -> DataFrame:
    """Explode each zip blob into its (non-directory) entries.

    Output: one row per entry — (row_idx, entry_name, entry_bytes,
    entry_size, error=NULL) — directory structure preserved in
    entry_name exactly as ``extractall`` lays it on disk. A corrupt /
    unreadable archive yields a single (row_idx, NULL, NULL, NULL,
    error) row; an empty-but-valid archive yields no rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx, blob in zip(pdf[idx_col], pdf[bin_col]):
                try:
                    with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                        bad = zf.testzip()
                        if bad is not None:
                            raise zipfile.BadZipFile(f"corrupt entry: {bad}")
                        for zi in zf.infolist():
                            if zi.is_dir():
                                continue
                            data = zf.read(zi)
                            rows.append(
                                (idx, zi.filename, data, len(data), None)
                            )
                except Exception as e:  # X4 per-row isolation
                    rows.append((idx, None, None, None, str(e)[:200]))
            yield pd.DataFrame(
                rows,
                columns=["row_idx", "entry_name", "entry_bytes",
                         "entry_size", "error"],
            )

    return df.select(
        F.col(idx_col).alias("row_idx"), F.col(bin_col).alias(bin_col)
    ).mapInPandas(run, ARCHIVE_ENTRY_SCHEMA)


def assign_new_filenames(df: DataFrame, filename_col: str = "filename",
                         idx_col: str = "row_idx",
                         ok_col: str | None = None,
                         info: dict | None = None) -> DataFrame:
    """The reference's NEW_FILENAME column, distributed.

    ``j`` for a successful row = number of successful rows before it in
    row order (errors never increment the counter) — i.e. rank−1 over
    successes ordered by ``idx_col``. NEW_FILENAME:

    - ``…zip`` / ``…rar`` → ``build-{j}``
    - otherwise → ``build-{j}.{suffix}`` with suffix =
      ``splitext(file)[-1]`` (leading dot INCLUDED → the reference's
      literal double dot, preserved)
    - failed rows → NULL (and no j consumed)

    ``ok_col`` (boolean) marks which rows processed successfully; with
    ``ok_col=None`` every row is successful (the pure naming pass).
    """
    from ..operators.frontier import with_global_rank
    from ..operators.preprocess import suffix_of

    ok = F.lit(True) if ok_col is None else F.col(ok_col)
    good = df.filter(ok)
    ranked = with_global_rank(good, [F.col(idx_col).asc()], out="_rk",
                              info=info)
    fname = F.col(filename_col)
    suffix = suffix_of(fname)
    j = (F.col("_rk") - 1).cast("long")
    new_filename = F.when(
        fname.endswith(ZIP_SUFFIX) | fname.endswith(RAR_SUFFIX),
        F.concat(F.lit("build-"), j.cast("string")),
    ).otherwise(
        # reference: f"build-{j}.{suffix}" with suffix == ".schem" etc.
        F.concat(F.lit("build-"), j.cast("string"), F.lit("."), suffix)
    )
    named = ranked.withColumn("new_filename", new_filename).drop("_rk")
    if ok_col is None:
        return named
    failed = df.filter(~ok).withColumn(
        "new_filename", F.lit(None).cast("string")
    )
    return named.unionByName(failed)


def unzip_and_move(df: DataFrame, filename_col: str = "filename",
                   bin_col: str = "content", idx_col: str = "row_idx",
                   info: dict | None = None) -> tuple[DataFrame, DataFrame]:
    """Full S8 pass: returns ``(named_rows, entries)``.

    ``named_rows``: input rows + ``new_filename`` (NULL for rows whose
    archive failed to open — reference error branch). ``entries``: the
    exploded zip contents keyed by row_idx, prefixed the way
    ``extractall(build-{j}/)`` lays them out. Non-archive rows (plain
    .schem/.schematic payloads) produce no entries — they are "moved",
    i.e. renamed by ``new_filename``.

    The exploded-entries pass feeds both outputs, so it is persisted to
    avoid running the Python unzip twice; the cached DataFrame is
    appended to ``info["persisted"]`` (same convention as
    ``with_global_rank``) for the caller to unpersist when done.
    """
    is_zip = F.col(filename_col).endswith(ZIP_SUFFIX)
    zips = df.filter(is_zip)
    entries = unzip_entries(zips, bin_col=bin_col, idx_col=idx_col).persist()
    if info is not None:
        info.setdefault("persisted", []).append(entries)
    errs = entries.filter(F.col("error").isNotNull()).select(
        F.col("row_idx").alias(idx_col), F.lit(False).alias("_ok")
    )
    flagged = df.join(F.broadcast(errs), idx_col, "left").withColumn(
        "_ok", F.coalesce(F.col("_ok"), F.lit(True))
    )
    named = assign_new_filenames(
        flagged, filename_col=filename_col, idx_col=idx_col, ok_col="_ok",
        info=info,
    ).drop("_ok")
    good_entries = entries.filter(F.col("error").isNull()).join(
        F.broadcast(
            named.filter(F.col("new_filename").isNotNull()).select(
                F.col(idx_col).alias("row_idx"), "new_filename"
            )
        ),
        "row_idx",
    ).select(
        "row_idx",
        F.concat_ws("/", "new_filename", "entry_name").alias("path"),
        "entry_name", "entry_bytes", "entry_size",
    )
    return named, good_entries
