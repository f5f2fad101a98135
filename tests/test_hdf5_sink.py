"""S11 HDF5 sink + S13 block-JSON sink: dense-array assembly, per-build
grouped-Arrow plumbing (injected writer — no h5py in this container),
X4 error isolation, and the S13→S10 JSON roundtrip."""

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.sources.hdf5 import (
    assemble_dense,
    blocks_to_build_json,
    write_builds_hdf5,
)


def test_assemble_dense_rebases_and_fills():
    pdf = pd.DataFrame({
        "x": [5, 7, 5], "y": [10, 10, 12], "z": [-3, -3, -1],
        "token": [1, 2, 3],
    })
    arr = assemble_dense(pdf, fill=0)
    assert arr.shape == (3, 3, 3)
    assert arr[0, 0, 0] == 1 and arr[2, 0, 0] == 2 and arr[0, 2, 2] == 3
    assert arr.sum() == 6  # everything else stayed fill


def test_assemble_dense_duplicate_cells_deterministic():
    # Spark gives no deterministic row order inside a group: a duplicate
    # (x,y,z) must resolve the same way regardless of incoming order —
    # max token wins (sort by (x,y,z,token) + last-write-wins)
    a = pd.DataFrame({"x": [0, 0], "y": [0, 0], "z": [0, 0], "token": [5, 9]})
    b = a.iloc[::-1].reset_index(drop=True)
    assert assemble_dense(a)[0, 0, 0] == 9
    assert assemble_dense(b)[0, 0, 0] == 9


def test_write_builds_hdf5_creates_missing_out_dir(spark, tmp_path):
    out_dir = str(tmp_path / "nested" / "not_yet")
    blocks = spark.createDataFrame(
        [(0, 0, 0, 0, 1)], "build_id long, x int, y int, z int, token long"
    )
    out = write_builds_hdf5(
        blocks, out_dir, writer=lambda p, n, a: np.save(p + ".npy", a)
    ).toPandas()
    # the env problem must NOT degrade into per-build X4 error rows
    assert out.error.iloc[0] is None
    assert os.path.isdir(out_dir)


def test_assemble_dense_bbox_guard():
    pdf = pd.DataFrame({"x": [0, 10**4], "y": [0, 10**4], "z": [0, 10**3],
                        "token": [1, 1]})
    with pytest.raises(ValueError, match="exceeds"):
        assemble_dense(pdf)


def test_write_builds_hdf5_with_injected_writer(spark, tmp_path):
    # the writer executes inside the Python WORKERS (grouped Arrow
    # pass), so the test observes it through the shared filesystem
    def fake_writer(path, name, arr):
        np.save(path + "." + name + ".npy", arr)

    blocks = spark.createDataFrame(
        [(0, 1, 2, 3, 7), (0, 2, 2, 3, 8), (1, 0, 0, 0, 9)],
        "build_id long, x int, y int, z int, token long",
    )
    out = write_builds_hdf5(
        blocks, str(tmp_path), writer=fake_writer
    ).toPandas().set_index("build_id").sort_index()
    assert out.loc[0, "error"] is None and out.loc[1, "error"] is None
    assert (out.loc[0, ["width", "height", "length"]] == [2, 1, 1]).all()
    assert out.loc[0, "n_blocks"] == 2 and out.loc[1, "n_blocks"] == 1
    # one file per build, dataset named after the file (reference layout)
    b0 = np.load(out.loc[0, "path"] + ".build_0.npy")
    b1 = np.load(out.loc[1, "path"] + ".build_1.npy")
    assert b0.tolist() == [[[7]], [[8]]]
    assert b1.tolist() == [[[9]]]


def test_write_builds_hdf5_isolates_oversized_build(spark, tmp_path):
    blocks = spark.createDataFrame(
        [(0, 0, 0, 0, 1), (0, 10**4, 10**4, 10**3, 1), (1, 0, 0, 0, 5)],
        "build_id long, x int, y int, z int, token long",
    )
    out = write_builds_hdf5(
        blocks, str(tmp_path), writer=lambda p, n, a: None
    ).toPandas().set_index("build_id")
    assert "exceeds" in out.loc[0, "error"]
    assert out.loc[1, "error"] is None  # the other build still lands


def test_hdf5_default_writer_is_h5py_gated(spark, tmp_path):
    has_h5py = True
    try:
        import h5py  # noqa: F401
    except ImportError:
        has_h5py = False
    blocks = spark.createDataFrame(
        [(0, 0, 0, 0, 1)], "build_id long, x int, y int, z int, token long"
    )
    out = write_builds_hdf5(blocks, str(tmp_path)).toPandas()
    if has_h5py:  # pragma: no cover - not in this container
        assert out.error.iloc[0] is None
    else:
        # X4: the missing-dependency error lands in the row, with the
        # documented remediation
        assert "h5py" in out.error.iloc[0]


def test_json_sink_roundtrips_through_s10_reader(spark, tmp_path):
    blocks = spark.createDataFrame(
        [(0, 4, 5, 6, "minecraft:stone"), (0, 5, 5, 6, "minecraft:oak_planks"),
         (0, 4, 7, 8, "minecraft:stone")],
        "build_id long, x int, y int, z int, block string",
    )
    docs = blocks_to_build_json(blocks).toPandas()
    assert docs.n_blocks.iloc[0] == 3
    parsed = json.loads(docs.doc.iloc[0])
    assert parsed["worldDimensions"] == {"width": 2, "height": 3, "length": 3}
    # S13 output parses back through the S10 reader with identical cells
    p = str(tmp_path / "b0.json")
    with open(p, "w") as f:
        f.write(docs.doc.iloc[0])
    from text2mc_dataprocessor_spark.operators.voxel import read_schematic_json

    back = read_schematic_json(spark, p)
    got = {(r.x, r.y, r.z): r.block for r in back.collect()}
    assert got == {
        (0, 0, 0): "minecraft:stone",
        (1, 0, 0): "minecraft:oak_planks",
        (0, 2, 2): "minecraft:stone",
    }
    assert back.first().width == 2 and back.first().height == 3


def test_sinks_are_grouped_arrow(spark):
    blocks = spark.createDataFrame(
        [(0, 0, 0, 0, 1)], "build_id long, x int, y int, z int, token long"
    )
    plan = write_builds_hdf5(
        blocks, "/tmp/x", writer=lambda p, n, a: None
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan and "BatchEvalPython" not in plan
