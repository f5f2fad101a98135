"""S9 .mca region source: header/sector codec, InhabitedTime lookup
order, 1.16+ bit-packing, and block explosion vs per-cell oracles."""

import numpy as np
import pytest

from text2mc_dataprocessor_spark.functions import nbt
from text2mc_dataprocessor_spark.sources.mca import (
    encode_region,
    inhabited_ticks,
    mca_blocks,
    mca_chunks,
    pack_section,
    read_region,
    unpack_section,
)


def section_nbt(y, palette, ids):
    pal = nbt.List_(nbt.TAG_COMPOUND, [
        nbt.Compound(
            {"Name": nbt.String(p["Name"]),
             **({"Properties": nbt.Compound(
                 {k: nbt.String(v) for k, v in p["Properties"].items()})}
                if p.get("Properties") else {})}
        )
        for p in palette
    ])
    bs = {"palette": pal}
    if ids is not None:
        bs["data"] = nbt.LongArray(pack_section(ids, n_palette=len(palette)))
    return nbt.Compound({"Y": nbt.Byte(y),
                         "block_states": nbt.Compound(bs)})


def test_pack_unpack_roundtrip():
    for n_pal in (2, 5, 16, 17, 100):
        rng = np.random.RandomState(n_pal)
        ids = rng.randint(0, n_pal, 4096)
        longs = pack_section(ids, n_palette=n_pal)
        back = unpack_section(["b"] * n_pal, longs)
        assert (back == ids).all(), n_pal


def test_region_roundtrip_and_inhabited_order():
    modern = nbt.Compound({
        "DataVersion": nbt.Int(3120),
        "InhabitedTime": nbt.Long(100),
        "sections": nbt.List_(nbt.TAG_COMPOUND, []),
    })
    legacy = nbt.Compound({
        "Level": nbt.Compound({"InhabitedTime": nbt.Long(10)}),
    })
    bare = nbt.Compound({"DataVersion": nbt.Int(3120)})
    blob = encode_region({(0, 0): modern, (1, 2): legacy, (31, 31): bare})
    chunks = read_region(blob)
    assert set(chunks) == {(0, 0), (1, 2), (31, 31)}
    assert inhabited_ticks(chunks[(0, 0)]) == 100
    assert inhabited_ticks(chunks[(1, 2)]) == 10
    assert inhabited_ticks(chunks[(31, 31)]) is None
    with pytest.raises(ValueError):
        read_region(b"\x00" * 100)  # short header


PALETTE = [
    {"Name": "minecraft:air"},
    {"Name": "minecraft:stone"},
    {"Name": "minecraft:brick_stairs",
     "Properties": {"half": "top", "facing": "north"}},
]
CANON = ["minecraft:air", "minecraft:stone",
         "minecraft:brick_stairs[facing=north,half=top]"]


def cell_oracle(cx, cz, y_sec, ids):
    """Reference-semantics per-cell loop: YZX within section, world
    coords 16·c + local, air skipped."""
    out = set()
    for j, pid in enumerate(ids):
        if CANON[pid] == "minecraft:air":
            continue
        lx, lz, ly = j % 16, (j // 16) % 16, j // 256
        out.add((16 * cx + lx, 16 * y_sec + ly, 16 * cz + lz, CANON[pid]))
    return out


def test_mca_chunks_and_blocks(spark):
    ids = [(i * 31) % 3 for i in range(4096)]
    chunk = nbt.Compound({
        "DataVersion": nbt.Int(3120),
        "InhabitedTime": nbt.Long(400),
        "sections": nbt.List_(nbt.TAG_COMPOUND, [section_nbt(2, PALETTE, ids)]),
    })
    empty = nbt.Compound({"Level": nbt.Compound({"InhabitedTime": nbt.Long(3)})})
    blob = encode_region({(1, 2): chunk, (0, 0): empty})
    df = spark.createDataFrame(
        [(7, bytearray(blob)), (8, bytearray(b"junk"))],
        "row_idx long, content binary",
    )
    got_chunks = mca_chunks(df).collect()
    ok = {(r.cx, r.cz): r for r in got_chunks if r.row_idx == 7}
    assert ok[(1, 2)].inhabited_time == 400
    assert ok[(1, 2)].n_sections == 1
    assert ok[(0, 0)].inhabited_time == 3
    errs = [r for r in got_chunks if r.row_idx == 8]
    assert len(errs) == 1 and errs[0].error is not None

    got_blocks = mca_blocks(df).collect()
    cells = {(r.x, r.y, r.z, r.block) for r in got_blocks if r.row_idx == 7
             and r.error is None}
    assert cells == cell_oracle(1, 2, 2, ids)
    assert all(r.cx == 1 and r.cz == 2 for r in got_blocks
               if r.row_idx == 7 and r.error is None)


def test_single_entry_palette_needs_no_data(spark):
    chunk = nbt.Compound({
        "sections": nbt.List_(nbt.TAG_COMPOUND, [
            section_nbt(0, [{"Name": "minecraft:stone"}], None)
        ]),
    })
    blob = encode_region({(0, 0): chunk})
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "row_idx long, content binary")
    got = mca_blocks(df).collect()
    assert len(got) == 4096
    assert {r.block for r in got} == {"minecraft:stone"}


def test_read_mca_files_binary_source(spark, tmp_path):
    from text2mc_dataprocessor_spark.sources.mca import read_mca_files

    chunk = nbt.Compound({"InhabitedTime": nbt.Long(77)})
    (tmp_path / "r.2.-3.mca").write_bytes(encode_region({(1, 1): chunk}))
    (tmp_path / "r.0.0.mca").write_bytes(encode_region({(5, 9): chunk}))
    got = read_mca_files(spark, str(tmp_path) + "/*.mca").collect()
    by_region = {r.region_file: r for r in got}
    assert set(by_region) == {"r.2.-3.mca", "r.0.0.mca"}
    r = by_region["r.2.-3.mca"]
    assert (r.rx, r.rz, r.cx, r.cz, r.inhabited_time) == (2, -3, 1, 1, 77)
