"""S12 .schem source: NBT codec roundtrip + Sponge varint/grid decode
vs a straight per-cell Python oracle (the semantics schematic4j's
blocks() stream gives the reference's JSON exporter)."""

import gzip

import pytest

from text2mc_dataprocessor_spark.functions import nbt
from text2mc_dataprocessor_spark.sources.schem import (
    decode_schem,
    decode_varints,
    encode_schem,
    encode_varints,
    schem_blocks,
)


def test_nbt_roundtrip_all_scalar_types():
    root = nbt.Compound({
        "b": nbt.Byte(-5),
        "s": nbt.Short(1234),
        "i": nbt.Int(-70000),
        "l": nbt.Long(1 << 40),
        "f": nbt.Float(1.5),
        "d": nbt.Double(-2.25),
        "str": nbt.String("héllo"),
        "bytes": nbt.ByteArray(b"\x01\x02\xff"),
        "ints": nbt.IntArray([1, -2, 3]),
        "longs": nbt.LongArray([1 << 35, -1]),
        "list": nbt.List_(nbt.TAG_STRING, [nbt.String("a"), nbt.String("b")]),
        "nested": nbt.Compound({"x": nbt.Int(7)}),
    })
    name, back = nbt.loads(nbt.dumps("root", root))
    assert name == "root"
    assert back["b"] == -5 and back["s"] == 1234 and back["i"] == -70000
    assert back["l"] == 1 << 40
    assert back["f"] == pytest.approx(1.5) and back["d"] == -2.25
    assert back["str"] == "héllo"
    assert back["bytes"] == b"\x01\x02\xff"
    assert back["ints"] == [1, -2, 3] and back["longs"] == [1 << 35, -1]
    assert back["list"] == ["a", "b"]
    assert back["nested"] == {"x": 7}


def test_varint_roundtrip_vectorized():
    ids = [0, 1, 127, 128, 255, 300, 16383, 16384, (1 << 31) - 1]
    assert decode_varints(encode_varints(ids)).tolist() == ids
    # bulk: every id in a realistic palette range
    big = list(range(0, 5000))
    assert decode_varints(encode_varints(big)).tolist() == big
    with pytest.raises(ValueError):
        decode_varints(b"\x80")  # truncated


def reference_cells(w, h, ln, palette, ids):
    """Per-cell oracle: schematic4j streams pos+palette-name in YZX."""
    inv = {v: k for k, v in palette.items()}
    out = set()
    for y in range(h):
        for z in range(ln):
            for x in range(w):
                i = (y * ln + z) * w + x
                out.add((x, y, z, inv[ids[i]]))
    return out


@pytest.mark.parametrize("version", [2, 3])
def test_decode_schem_matches_cell_oracle(version):
    palette = {"minecraft:air": 0, "minecraft:stone": 1,
               "minecraft:brick_stairs[facing=north,half=top]": 2}
    w, h, ln = 3, 2, 4
    ids = [(i * 7) % 3 for i in range(w * h * ln)]
    blob = encode_schem(w, h, ln, palette, ids, version=version)
    s = decode_schem(blob)
    assert (s["width"], s["height"], s["length"]) == (w, h, ln)
    assert s["palette"] == palette
    assert s["block_ids"].tolist() == ids


def test_decode_uncompressed_and_errors():
    palette = {"minecraft:dirt": 0}
    blob = encode_schem(1, 1, 1, palette, [0], compress=False)
    assert decode_schem(blob)["palette"] == palette
    with pytest.raises(ValueError):
        decode_schem(b"\x0a\x00\x00\x00")  # empty compound, no dims
    with pytest.raises(ValueError):
        # dims say 8 cells, data has 1
        decode_schem(encode_schem(2, 2, 2, palette, [0]))


def test_schem_blocks_explodes_grid(spark):
    palette = {"minecraft:air": 0, "minecraft:stone": 1}
    w, h, ln = 2, 2, 2
    ids = [i % 2 for i in range(8)]
    good = encode_schem(w, h, ln, palette, ids)
    rows = [(0, bytearray(good)), (1, bytearray(b"NOT NBT"))]
    df = spark.createDataFrame(rows, "row_idx long, content binary")
    got = schem_blocks(df).collect()
    ok = [(r.x, r.y, r.z, r.block) for r in got if r.row_idx == 0]
    assert set(ok) == reference_cells(w, h, ln, palette, ids)
    assert all(
        (r.width, r.height, r.length) == (w, h, ln)
        for r in got if r.row_idx == 0
    )
    errs = [r for r in got if r.row_idx == 1]
    assert len(errs) == 1 and errs[0].error is not None and errs[0].block is None


def test_gzip_detection():
    palette = {"minecraft:dirt": 0}
    raw = encode_schem(1, 1, 1, palette, [0], compress=False)
    assert decode_schem(gzip.compress(raw))["width"] == 1


def test_blocks_to_schem_roundtrip(spark):
    """Sink → source roundtrip: sparse block rows at arbitrary world
    coords come back as a rebased dense grid with air fill."""
    from text2mc_dataprocessor_spark.sources.schem import blocks_to_schem

    rows = [
        # build 1: two blocks, world coords offset by (10, 5, -3)
        (1, 10, 5, -3, "minecraft:stone"),
        (1, 11, 5, -2, "minecraft:brick_stairs[facing=north,half=top]"),
        # build 2: single block
        (2, 0, 0, 0, "minecraft:dirt"),
    ]
    df = spark.createDataFrame(
        rows, "build_id long, x int, y int, z int, block string"
    )
    blobs = blocks_to_schem(df)
    got = {r.build_id: r for r in blobs.collect()}
    assert got[1].error is None
    assert (got[1].width, got[1].height, got[1].length) == (2, 1, 2)
    assert got[2].n_blocks == 1

    back = schem_blocks(
        blobs.selectExpr("build_id AS row_idx", "schem AS content")
    )
    cells = {(r.x, r.y, r.z, r.block) for r in back.collect() if r.row_idx == 1}
    assert cells == {
        (0, 0, 0, "minecraft:stone"),                              # rebased
        (1, 0, 1, "minecraft:brick_stairs[facing=north,half=top]"),
        (1, 0, 0, "minecraft:air"),                                # air fill
        (0, 0, 1, "minecraft:air"),
    }


def test_blocks_to_schem_bbox_guard(spark):
    """Two far-apart blocks in one build → error row, not an OOM."""
    from text2mc_dataprocessor_spark.sources.schem import blocks_to_schem

    df = spark.createDataFrame(
        [(9, 0, 0, 0, "minecraft:stone"), (9, 100000, 0, 100000, "minecraft:dirt")],
        "build_id long, x int, y int, z int, block string",
    )
    rows = blocks_to_schem(df).collect()
    assert len(rows) == 1 and rows[0].error is not None and rows[0].schem is None


def test_read_schem_files_binary_source(spark, tmp_path):
    from text2mc_dataprocessor_spark.sources.schem import read_schem_files

    palette = {"minecraft:air": 0, "minecraft:stone": 1}
    for name, ids in [("a.schem", [1, 0, 0, 1]), ("b.schem", [0, 1, 1, 0])]:
        (tmp_path / name).write_bytes(encode_schem(2, 1, 2, palette, ids))
    got = read_schem_files(spark, str(tmp_path) + "/*.schem")
    rows = got.filter(got.error.isNull()).collect()
    assert len(rows) == 8  # 4 cells x 2 files
    by_file = {}
    for r in rows:
        by_file.setdefault(r.path.rsplit("/", 1)[-1], set()).add(
            (r.x, r.y, r.z, r.block))
    assert by_file["a.schem"] == {
        (0, 0, 0, "minecraft:stone"), (1, 0, 0, "minecraft:air"),
        (0, 0, 1, "minecraft:air"), (1, 0, 1, "minecraft:stone")}
    assert len(by_file["b.schem"]) == 4
