"""S9 — Anvil ``.mca`` region-file source, Spark-native.

The reference iterates region files with the anvil-parser package:
``anvil.Region.from_file`` → per-chunk ``chunk_data(x, z)`` for (x, z)
in 32×32, InhabitedTime from ``Level.InhabitedTime`` (pre-1.18) or the
chunk root (1.18+), divided by 20 into seconds and gated at 1.5 s
(/root/reference/world2vec/world2vec.py:141-194). The engine decodes
the same public on-disk format directly:

- region header: 1024 × 4-byte location entries (3-byte sector offset,
  1-byte sector count; chunk (x,z) at index ``x + 32·z``), then 1024
  timestamps; sectors are 4 KiB
- chunk payload: 4-byte big-endian length, 1 compression byte
  (1 = gzip, 2 = zlib, 3 = raw), then the chunk's NBT
- 1.18+ block storage: per section a ``palette`` list of
  {Name, Properties} and a bit-packed ``data`` long array — entries
  never span longs (1.16+ packing), ``bits = max(4, ceil(log2(|palette|)))``,
  4096 YZX cells per section

Scale shape: one region per input row (≤ 8 MiB typical, hard-bounded
by the 1024-sector offset field), all per-cell math numpy-vectorized
(the only Python loops are over present chunks and their bounded
palettes). Corrupt regions/chunks → error rows (X4), never task
failures.
"""

from __future__ import annotations

import gzip
import math
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import nbt

SECTOR = 4096

MCA_CHUNK_SCHEMA = (
    "row_idx long, cx int, cz int, inhabited_time long, "
    "data_version int, n_sections int, error string"
)

MCA_BLOCK_SCHEMA = (
    "row_idx long, cx int, cz int, x int, y int, z int, "
    "block string, error string"
)


# --- pure codec ----------------------------------------------------------------

def read_region(blob: bytes) -> dict[tuple[int, int], dict]:
    """Region bytes → {(cx, cz): chunk root compound} for present
    chunks. Raises on a malformed header; a malformed individual chunk
    raises ValueError with its coords (callers isolate per-row)."""
    blob = bytes(blob)
    if len(blob) < 2 * SECTOR:
        raise ValueError("region shorter than its 8 KiB header")
    out = {}
    for idx in range(1024):
        off3 = blob[idx * 4: idx * 4 + 3]
        count = blob[idx * 4 + 3]
        offset = int.from_bytes(off3, "big")
        if offset == 0 and count == 0:
            continue  # chunk absent
        cx, cz = idx % 32, idx // 32
        start = offset * SECTOR
        if start + 5 > len(blob):
            raise ValueError(f"chunk ({cx},{cz}) offset beyond file")
        (length,) = struct.unpack(">i", blob[start: start + 4])
        ctype = blob[start + 4]
        payload = blob[start + 5: start + 4 + length]
        if ctype == 1:
            raw = gzip.decompress(payload)
        elif ctype == 2:
            raw = zlib.decompress(payload)
        elif ctype == 3:
            raw = payload
        else:
            raise ValueError(f"chunk ({cx},{cz}) unknown compression {ctype}")
        _, root = nbt.loads(raw)
        out[(cx, cz)] = root
    return out


def inhabited_ticks(chunk_root: dict) -> int | None:
    """Reference lookup order (world2vec.py:176-186): ``Level.
    InhabitedTime`` (pre-flattening), then root ``InhabitedTime``,
    else None (field absent → F10 keeps the chunk)."""
    lvl = chunk_root.get("Level")
    if isinstance(lvl, dict) and "InhabitedTime" in lvl:
        return int(lvl["InhabitedTime"])
    if "InhabitedTime" in chunk_root:
        return int(chunk_root["InhabitedTime"])
    return None


def unpack_section(palette_names: list[str], data, bits: int | None = None
                   ) -> np.ndarray:
    """1.16+ packed long array → 4096 palette indices (YZX),
    numpy-vectorized. Entries never span longs; each long holds
    ``64 // bits`` entries, low bits first."""
    if bits is None:
        bits = max(4, math.ceil(math.log2(max(len(palette_names), 2))))
    if not data:
        return np.zeros(4096, dtype=np.int64)
    longs = np.asarray(data, dtype=np.int64).view(np.uint64)
    epl = 64 // bits
    j = np.arange(4096, dtype=np.int64)
    li = j // epl
    slot = (j % epl).astype(np.uint64) * np.uint64(bits)
    if li[-1] >= longs.size:
        raise ValueError(
            f"packed data has {longs.size} longs, need {li[-1] + 1}"
        )
    mask = np.uint64((1 << bits) - 1)
    return ((longs[li] >> slot) & mask).astype(np.int64)


def pack_section(indices, bits: int | None = None, n_palette: int = 0
                 ) -> list[int]:
    """Inverse of :func:`unpack_section` (fixture side)."""
    if bits is None:
        bits = max(4, math.ceil(math.log2(max(n_palette, 2))))
    idx = np.asarray(indices, dtype=np.uint64)
    epl = 64 // bits
    n_longs = (idx.size + epl - 1) // epl
    out = np.zeros(n_longs, dtype=np.uint64)
    j = np.arange(idx.size)
    np.bitwise_or.at(
        out, j // epl, idx << ((j % epl).astype(np.uint64) * np.uint64(bits))
    )
    return [int(v) for v in out.view(np.int64)]


def encode_region(chunks: dict[tuple[int, int], "nbt.Compound"]) -> bytes:
    """Fixture writer: a valid .mca with zlib (type 2) chunk payloads."""
    header = bytearray(2 * SECTOR)
    body = bytearray()
    next_sector = 2
    for (cx, cz), root in chunks.items():
        raw = nbt.dumps("", root)
        comp = zlib.compress(raw)
        payload = struct.pack(">i", len(comp) + 1) + bytes([2]) + comp
        n_sectors = (len(payload) + SECTOR - 1) // SECTOR
        payload += b"\x00" * (n_sectors * SECTOR - len(payload))
        idx = (cx % 32) + (cz % 32) * 32
        header[idx * 4: idx * 4 + 3] = next_sector.to_bytes(3, "big")
        header[idx * 4 + 3] = n_sectors
        body += payload
        next_sector += n_sectors
    return bytes(header) + bytes(body)


def _canonical(name: str, props: dict | None) -> str:
    """P12 canonical blockstate string: name[k=v,…] keys sorted
    (matches operators/voxel.canonical_blockstate)."""
    if not props:
        return name
    inner = ",".join(f"{k}={props[k]}" for k in sorted(props))
    return f"{name}[{inner}]"


# --- Spark sources -------------------------------------------------------------

def mca_chunks(df: DataFrame, bin_col: str = "content",
               idx_col: str = "row_idx") -> DataFrame:
    """Explode regions → one row per present chunk:
    (row_idx, cx, cz, inhabited_time ticks | NULL, data_version,
    n_sections). Feed ``inhabited_time`` to F10's ``inhabited_gate``
    (the reference divides by 20 then gates at 1.5 s == 30 ticks)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["row_idx", "cx", "cz", "inhabited_time",
                "data_version", "n_sections", "error"]
        for pdf in batches:
            rows = []
            for idx, blob in zip(pdf[idx_col], pdf[bin_col]):
                try:
                    for (cx, cz), root in read_region(blob).items():
                        secs = root.get("sections")
                        if secs is None and isinstance(root.get("Level"), dict):
                            secs = root["Level"].get("Sections")
                        rows.append((
                            idx, cx, cz, inhabited_ticks(root),
                            root.get("DataVersion"),
                            len(secs) if secs is not None else 0,
                            None,
                        ))
                except Exception as e:  # X4
                    rows.append((idx, None, None, None, None, None,
                                 str(e)[:200]))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(
        F.col(idx_col).alias(idx_col), F.col(bin_col).alias(bin_col)
    ).mapInPandas(run, MCA_CHUNK_SCHEMA)


def mca_blocks(df: DataFrame, bin_col: str = "content",
               idx_col: str = "row_idx",
               keep_air: bool = False) -> DataFrame:
    """Explode 1.18+ regions → one row per block cell with the
    canonical blockstate string. World coords:
    ``x = 16·cx + lx``, ``y = 16·Y + ly``, ``z = 16·cz + lz``; section
    cells are YZX (``j = 256·ly + 16·lz + lx``), inverted vectorized.
    ``minecraft:air`` cells are dropped unless ``keep_air`` (the
    reference's block scans skip air the same way)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["row_idx", "cx", "cz", "x", "y", "z", "block", "error"]
        for pdf in batches:
            for idx, blob in zip(pdf[idx_col], pdf[bin_col]):
                try:
                    frames = []
                    for (cx, cz), root in read_region(blob).items():
                        for sec in root.get("sections") or []:
                            bs = sec.get("block_states")
                            if not bs or "palette" not in bs:
                                continue
                            names = np.array(
                                [_canonical(p.get("Name", ""),
                                            p.get("Properties"))
                                 for p in bs["palette"]],
                                dtype=object,
                            )
                            if len(names) == 1 and "data" not in bs:
                                ids = np.zeros(4096, dtype=np.int64)
                            else:
                                ids = unpack_section(
                                    list(names), bs.get("data", [])
                                )
                            j = np.arange(4096, dtype=np.int64)
                            lx, lz, ly = j % 16, (j // 16) % 16, j // 256
                            blocks = names[ids]
                            keep = (
                                np.ones(4096, dtype=bool) if keep_air
                                else blocks != "minecraft:air"
                            )
                            if not keep.any():
                                continue
                            y0 = 16 * int(sec.get("Y", 0))
                            frames.append(pd.DataFrame({
                                "row_idx": np.int64(idx),
                                "cx": np.int32(cx), "cz": np.int32(cz),
                                "x": (16 * cx + lx[keep]).astype(np.int32),
                                "y": (y0 + ly[keep]).astype(np.int32),
                                "z": (16 * cz + lz[keep]).astype(np.int32),
                                "block": blocks[keep],
                                "error": None,
                            }))
                    if frames:
                        yield pd.concat(frames, ignore_index=True)
                except Exception as e:  # X4
                    yield pd.DataFrame(
                        [(idx, None, None, None, None, None, None,
                          str(e)[:200])],
                        columns=cols,
                    )

    return df.select(
        F.col(idx_col).alias(idx_col), F.col(bin_col).alias(bin_col)
    ).mapInPandas(run, MCA_BLOCK_SCHEMA)


def read_mca_files(spark, path: str) -> DataFrame:
    """Directory/glob of .mca files → chunk table via the splittable
    ``binaryFile`` source, keyed by a stable path hash, with the P11
    region coords parsed from the filename."""
    from ..operators.voxel import region_coords

    bins = spark.read.format("binaryFile").load(path)
    keyed = bins.select(
        F.xxhash64("path").alias("row_idx"),
        F.element_at(F.split("path", "/"), -1).alias("region_file"),
        F.col("content"),
    )
    chunks = mca_chunks(keyed)
    names = keyed.select(
        "row_idx", "region_file",
        region_coords("region_file").alias("rc"),
    ).select("row_idx", "region_file", "rc.rx", "rc.rz")
    return chunks.join(F.broadcast(names), "row_idx", "left")
