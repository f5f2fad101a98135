"""S12 — Sponge ``.schem`` schematic source, Spark-native.

The reference shells out to a Java sidecar (schematic4j) per file and
re-imports its JSON (`schematic-loader/src/main/java/org/text2mc/
SchematicHandler.java:19`, `FileHandler.java:38-50`); the sidecar
streams every (pos, palette-name) cell of the W×H×L grid into the
``blocks`` list consumed by S10. The engine decodes the same public
format (Sponge Schematic v1/v2: root ``Width/Height/Length`` shorts,
``Palette`` compound of blockstate→id, ``BlockData`` LEB128-varint byte
array in YZX order; v3: the same nested under ``Blocks``) directly
inside Arrow-batched tasks — no sidecar process, no JSON detour, same
output table as ``read_schematic_json``.

Scale shape: one schematic per input row (artifact payloads are ≤50 MB
after F4), decoded with numpy-vectorized varint + index math — the only
per-element Python is over the PALETTE (bounded vocabulary), never over
blocks. A corrupt blob yields one error row (X4), never a task failure.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import nbt

SCHEM_BLOCK_SCHEMA = (
    "row_idx long, width int, height int, length int, "
    "x int, y int, z int, block string, error string"
)


def decode_varints(data: bytes) -> np.ndarray:
    """LEB128-unsigned varint stream → int64 array, numpy-vectorized.

    The inner loop runs over varint BYTE-WIDTH (≤5 for the 32-bit ids
    the Sponge spec allows), not over elements.
    """
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.nonzero((arr & 0x80) == 0)[0]
    if ends.size == 0 or ends[-1] != arr.size - 1:
        raise ValueError("truncated varint stream")
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(ends.size, dtype=np.int64)
    for k in range(5):
        pos = starts + k
        live = pos <= ends
        if not live.any():
            break
        b = arr[pos[live]].astype(np.int64)
        vals[live] |= (b & 0x7F) << (7 * k)
    return vals


def encode_varints(ids) -> bytes:
    """Inverse of :func:`decode_varints` (fixture/test side)."""
    out = bytearray()
    for v in ids:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def _maybe_decompress(blob: bytes) -> bytes:
    if blob[:2] == b"\x1f\x8b":  # gzip magic (the spec's on-disk form)
        return gzip.decompress(blob)
    if blob[:1] == b"\x78":  # zlib (seen in the wild for embedded chunks)
        try:
            return zlib.decompress(blob)
        except zlib.error:
            pass
    return blob


def decode_schem(blob: bytes) -> dict:
    """→ {width, height, length, palette: {name: id}, block_ids: int64[]}.

    Accepts Sponge v1/v2 roots and the v3 ``Blocks`` nesting. Raises on
    anything else (legacy MCEdit ``.schematic`` needs the numeric-id
    era mapping table, which is out of scope — schematic4j embeds it).
    """
    _, root = nbt.loads(_maybe_decompress(bytes(blob)))
    if "Schematic" in root and isinstance(root["Schematic"], dict):
        root = root["Schematic"]  # v3 wraps everything one level down
    for k in ("Width", "Height", "Length"):
        if k not in root:
            raise ValueError(f"not a Sponge schematic: missing {k}")
    if "Blocks" in root and isinstance(root["Blocks"], dict):
        palette = root["Blocks"]["Palette"]  # v3
        data = root["Blocks"]["Data"]
    else:
        palette = root["Palette"]  # v1/v2
        data = root["BlockData"]
    w, h, ln = int(root["Width"]), int(root["Height"]), int(root["Length"])
    ids = decode_varints(data)
    if ids.size != w * h * ln:
        raise ValueError(
            f"BlockData has {ids.size} cells, dimensions say {w * h * ln}"
        )
    return {
        "width": w, "height": h, "length": ln,
        "palette": {k: int(v) for k, v in palette.items()},
        "block_ids": ids,
    }


def encode_schem(width: int, height: int, length: int,
                 palette: dict[str, int], block_ids,
                 version: int = 2, compress: bool = True) -> bytes:
    """Fixture-side writer: a valid Sponge v2 (or v3-nested) .schem."""
    inner = {
        "Version": nbt.Int(version),
        "DataVersion": nbt.Int(2586),
        "Width": nbt.Short(width),
        "Height": nbt.Short(height),
        "Length": nbt.Short(length),
    }
    pal = nbt.Compound({k: nbt.Int(v) for k, v in palette.items()})
    data = nbt.ByteArray(encode_varints(block_ids))
    if version >= 3:
        inner["Blocks"] = nbt.Compound({"Palette": pal, "Data": data})
    else:
        inner["Palette"] = pal
        inner["PaletteMax"] = nbt.Int(len(palette))
        inner["BlockData"] = data
    raw = nbt.dumps("Schematic", nbt.Compound(inner))
    return gzip.compress(raw, mtime=0) if compress else raw


def schem_blocks(df: DataFrame, bin_col: str = "content",
                 idx_col: str = "row_idx") -> DataFrame:
    """Explode .schem blobs → one row per grid cell, schematic4j-
    equivalent: (row_idx, width, height, length, x, y, z, block) with
    ``block`` the full palette string (states in brackets included) and
    YZX linearization ``i = (y·Length + z)·Width + x`` inverted
    vectorized. Corrupt blobs → one row with ``error`` set.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["row_idx", "width", "height", "length",
                "x", "y", "z", "block", "error"]
        for pdf in batches:
            for idx, blob in zip(pdf[idx_col], pdf[bin_col]):
                try:
                    s = decode_schem(blob)
                    w, h, ln = s["width"], s["height"], s["length"]
                    ids = s["block_ids"]
                    # invert the palette once (bounded vocab), then one
                    # vectorized take over all cells
                    names = np.empty(max(s["palette"].values()) + 1,
                                     dtype=object)
                    for name, pid in s["palette"].items():
                        names[pid] = name
                    i = np.arange(ids.size, dtype=np.int64)
                    x = i % w
                    z = (i // w) % ln
                    y = i // (w * ln)
                    out = pd.DataFrame({
                        "row_idx": np.full(ids.size, idx, dtype=np.int64),
                        "width": np.full(ids.size, w, dtype=np.int32),
                        "height": np.full(ids.size, h, dtype=np.int32),
                        "length": np.full(ids.size, ln, dtype=np.int32),
                        "x": x.astype(np.int32),
                        "y": y.astype(np.int32),
                        "z": z.astype(np.int32),
                        "block": names[ids],
                        "error": np.full(ids.size, None, dtype=object),
                    })
                    yield out
                except Exception as e:  # X4 per-row isolation
                    yield pd.DataFrame(
                        [(idx, None, None, None, None, None, None, None,
                          str(e)[:200])],
                        columns=cols,
                    )

    return df.select(
        F.col(idx_col).alias(idx_col), F.col(bin_col).alias(bin_col)
    ).mapInPandas(run, SCHEM_BLOCK_SCHEMA)


def read_schem_files(spark, path: str) -> DataFrame:
    """Directory/glob of .schem files → exploded block table. Rides
    Spark's splittable-by-file ``binaryFile`` source; row_idx is a
    stable hash of the file path."""
    bins = spark.read.format("binaryFile").load(path)
    keyed = bins.select(
        F.xxhash64("path").alias("row_idx"),
        F.col("path"),
        F.col("content"),
    )
    blocks = schem_blocks(keyed, bin_col="content", idx_col="row_idx")
    return blocks.join(
        F.broadcast(keyed.select("row_idx", "path")), "row_idx", "left"
    )
