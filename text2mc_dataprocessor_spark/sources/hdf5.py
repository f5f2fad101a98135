"""S11 HDF5 sink + S13 block-JSON sink.

The reference exports each extracted build twice on its way into
training: (a) a dense 3D array written to one ``.h5`` file holding a
single dataset named after the file (world2vec.py:568-572
``export_npy_to_hdf5``; world2vecDriver.py:267-269
``convert_vector_to_hdf5``), and (b) the schematic-loader sidecar JSON
``{"worldDimensions": {width, height, length}, "blocks": [{x, y, z,
name}, …]}`` that ``export_json_to_npy`` (world2vec.py:546-566) reads
back — the same format operators/voxel.py ``read_schematic_json`` (S10)
consumes.

Spark shape: both sinks are grouped-Arrow passes — one task per build
assembles that build's dense array / JSON document; no build ever
crosses task boundaries and the driver never sees block rows. The HDF5
byte-writer itself is pluggable because ``h5py`` is not installed in
this container: the default writer import-gates h5py with a clear
error, and tests inject a numpy-based writer to exercise the full
Spark plumbing (grouping, assembly, file naming, result schema) — the
``functions/multimodal.py`` ``fake=True`` discipline.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HDF5_RESULT_SCHEMA = (
    "build_id long, path string, width int, height int, length int, "
    "n_blocks long, error string"
)
JSON_RESULT_SCHEMA = "build_id long, doc string, n_blocks long"

#: refuse to densify absurd bounding boxes (same guard as the S12 sink)
MAX_CELLS = 16_000_000


def assemble_dense(pdf: pd.DataFrame, fill=0) -> np.ndarray:
    """Per-build (x, y, z, token) rows → dense (width, height, length)
    array, coordinates rebased to the build's minimum corner and empty
    cells filled with ``fill`` — the reference's world_array layout
    (world2vec.py:557-566, indexed ``[x, y, z]``). Pure numpy, tested
    independently of any writer."""
    xs = pdf["x"].to_numpy(dtype=np.int64)
    ys = pdf["y"].to_numpy(dtype=np.int64)
    zs = pdf["z"].to_numpy(dtype=np.int64)
    toks = pdf["token"].to_numpy(dtype=np.int64)
    # Spark gives no deterministic row order inside a group; sort by
    # (x, y, z, token) so a duplicate coordinate resolves to its MAX
    # token under last-write-wins, not to whichever row arrived last
    order = np.lexsort((toks, zs, ys, xs))
    xs, ys, zs, toks = xs[order], ys[order], zs[order], toks[order]
    x0, y0, z0 = xs.min(), ys.min(), zs.min()
    dims = (int(xs.max() - x0 + 1), int(ys.max() - y0 + 1), int(zs.max() - z0 + 1))
    if dims[0] * dims[1] * dims[2] > MAX_CELLS:
        raise ValueError(f"build bbox {dims} exceeds {MAX_CELLS} cells")
    arr = np.full(dims, fill, dtype=np.int64)
    arr[xs - x0, ys - y0, zs - z0] = toks
    return arr


def _h5py_writer(path: str, name: str, arr: np.ndarray) -> None:
    try:
        import h5py
    except ImportError as e:  # pragma: no cover - container has no h5py
        raise ImportError(
            "h5py is not installed in this environment; pass an explicit "
            "writer= (e.g. a numpy .npy writer) or keep builds in the "
            "parquet/snapshot stand-in (sources/snapshots.py)"
        ) from e
    with h5py.File(path, "w") as f:
        # dataset named after the file, as the reference writes it
        f.create_dataset(name, data=arr)


def write_builds_hdf5(
    blocks: DataFrame,
    out_dir: str,
    prefix: str = "build",
    fill: int = 0,
    writer: Callable[[str, str, np.ndarray], None] | None = None,
) -> DataFrame:
    """S11 — one HDF5 file per build: (build_id, x, y, z, token) rows →
    ``<out_dir>/<prefix>_<build_id>.h5`` with one dense int dataset
    (reference: convert_vector_to_hdf5 per processed build). Returns
    (build_id, path, width, height, length, n_blocks, error); per-build
    failures isolate into error rows (X4). ``writer(path, name, arr)``
    defaults to the h5py writer and is injectable for environments
    without h5py."""
    write = writer or _h5py_writer
    # create the sink dir driver-side: a missing out_dir is an
    # environmental misconfiguration, not a per-build failure — without
    # this every build degrades into an X4 error row that callers can miss
    os.makedirs(out_dir, exist_ok=True)

    def per_build(pdf: pd.DataFrame) -> pd.DataFrame:
        bid = int(pdf["build_id"].iloc[0])
        name = f"{prefix}_{bid}"
        path = os.path.join(out_dir, f"{name}.h5")
        try:
            arr = assemble_dense(pdf, fill=fill)
            write(path, name, arr)
            w, h, ln = arr.shape
            return pd.DataFrame(
                [(bid, path, w, h, ln, len(pdf), None)],
                columns=["build_id", "path", "width", "height", "length",
                         "n_blocks", "error"],
            )
        except Exception as e:  # noqa: BLE001 - X4 per-build isolation
            return pd.DataFrame(
                [(bid, None, None, None, None, len(pdf), str(e)[:200])],
                columns=["build_id", "path", "width", "height", "length",
                         "n_blocks", "error"],
            )

    return (
        blocks.select("build_id", "x", "y", "z", "token")
        .groupBy("build_id")
        .applyInPandas(per_build, HDF5_RESULT_SCHEMA)
    )


def blocks_to_build_json(blocks: DataFrame, block_col: str = "block") -> DataFrame:
    """S13 — the sidecar block-JSON sink: per build, exactly the
    document ``export_json_to_npy`` (world2vec.py:546-566) parses and
    S10's ``read_schematic_json`` consumes: ``worldDimensions`` from
    the rebased bounding box plus one ``{x, y, z, name}`` entry per
    block in deterministic (x, y, z) order. Returns (build_id, doc,
    n_blocks); write with ``df.write.json(...)`` / ``.text(...)``."""

    def per_build(pdf: pd.DataFrame) -> pd.DataFrame:
        bid = int(pdf["build_id"].iloc[0])
        pdf = pdf.sort_values(["x", "y", "z"], kind="stable")
        xs, ys, zs = (pdf[c].to_numpy(dtype=np.int64) for c in ("x", "y", "z"))
        x0, y0, z0 = xs.min(), ys.min(), zs.min()
        doc = {
            "worldDimensions": {
                "width": int(xs.max() - x0 + 1),
                "height": int(ys.max() - y0 + 1),
                "length": int(zs.max() - z0 + 1),
            },
            "blocks": [
                {"x": int(x - x0), "y": int(y - y0), "z": int(z - z0), "name": n}
                for x, y, z, n in zip(xs, ys, zs, pdf[block_col])
            ],
        }
        return pd.DataFrame(
            [(bid, json.dumps(doc, separators=(",", ":")), len(pdf))],
            columns=["build_id", "doc", "n_blocks"],
        )

    return (
        blocks.select("build_id", "x", "y", "z", F.col(block_col).alias(block_col))
        .groupBy("build_id")
        .applyInPandas(per_build, JSON_RESULT_SCHEMA)
    )
