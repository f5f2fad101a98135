"""End-to-end world2vec plan over synthetic regions: S9 decode → F10
gate → F8 qualification → X5 DBSCAN → J4 bbox re-sweep → S12 schematic
export, asserted against the hand-computable expected world."""

import numpy as np

from text2mc_dataprocessor_spark.functions import nbt
from text2mc_dataprocessor_spark.plans.world2vec import extract_builds
from text2mc_dataprocessor_spark.sources.mca import encode_region, pack_section
from text2mc_dataprocessor_spark.sources.schem import decode_schem

NATURAL = ["minecraft:stone", "minecraft:dirt", "minecraft:grass_block"]
PALETTE = [
    {"Name": "minecraft:air"},
    {"Name": "minecraft:stone"},
    {"Name": "minecraft:oak_planks"},
]


def chunk_nbt(inhabited, with_planks):
    """One Y=0 section: stone at local (0,5,0); oak_planks at (1,6,1)
    for build chunks."""
    ids = np.zeros(4096, dtype=np.int64)
    ids[5 * 256 + 0 * 16 + 0] = 1          # y=5,z=0,x=0 -> stone
    if with_planks:
        ids[6 * 256 + 1 * 16 + 1] = 2      # y=6,z=1,x=1 -> planks
    pal = nbt.List_(nbt.TAG_COMPOUND, [
        nbt.Compound({"Name": nbt.String(p["Name"])}) for p in PALETTE
    ])
    sec = nbt.Compound({
        "Y": nbt.Byte(0),
        "block_states": nbt.Compound({
            "palette": pal,
            "data": nbt.LongArray(pack_section(ids, n_palette=len(PALETTE))),
        }),
    })
    return nbt.Compound({
        "DataVersion": nbt.Int(3120),
        "InhabitedTime": nbt.Long(inhabited),
        "sections": nbt.List_(nbt.TAG_COMPOUND, [sec]),
    })


def make_world(spark):
    """Region (0,0): build A = 3x3 chunks at (2..4)^2 with planks,
    except the natural-only center (3,3); one gated chunk at (10,10)
    (planks but uninhabited). Region (1,0): build B = 3x3 planked
    chunks at local (2..4)^2 -> global gcx 34..36."""
    r0 = {}
    for cx in range(2, 5):
        for cz in range(2, 5):
            planks = not (cx == 3 and cz == 3)
            r0[(cx, cz)] = chunk_nbt(400, planks)
    r0[(10, 10)] = chunk_nbt(3, True)  # F10-gated
    r1 = {
        (cx, cz): chunk_nbt(400, True)
        for cx in range(2, 5) for cz in range(2, 5)
    }
    rows = [
        (0, 0, 0, bytearray(encode_region(r0))),
        (1, 1, 0, bytearray(encode_region(r1))),
    ]
    return spark.createDataFrame(
        rows, "row_idx long, rx int, rz int, content binary"
    )


def test_extract_builds_end_to_end(spark):
    out = extract_builds(make_world(spark), NATURAL)

    assert out["modded"].count() == 0  # F9: nothing outside minecraft:

    labeled = {(r.gcx, r.gcz): r.label for r in out["labeled_chunks"].collect()}
    # qualified = planked AND inhabited: 8 in A (center is natural-only),
    # 9 in B; the (10,10) planked chunk is F10-gated out entirely
    assert len(labeled) == 17
    assert (10, 10) not in labeled
    a_labels = {labeled[(x, z)] for x in range(2, 5) for z in range(2, 5)
                if (x, z) != (3, 3)}
    b_labels = {labeled[(x + 32, z)] for x in range(2, 5) for z in range(2, 5)}
    assert a_labels == {0} and b_labels == {1}  # numbered by min coords

    schems = {r.build_id: r for r in out["schems"].collect()}
    assert set(schems) == {0, 1} and all(r.error is None for r in schems.values())

    # Build A: J4 re-sweep pulls the natural-only center chunk back in,
    # so its stone block ships in the schematic
    s = decode_schem(schems[0].schem)
    inv = {v: k for k, v in s["palette"].items()}
    w, ln = s["width"], s["length"]
    cells = {}
    for i, pid in enumerate(s["block_ids"]):
        if inv[pid] != "minecraft:air":
            cells[(i % w, i // (w * ln), (i // w) % ln)] = inv[pid]
    # block mins over build A: x/z = 16*2 = 32, y = 5
    want = {}
    for cx in range(2, 5):
        for cz in range(2, 5):
            want[(16 * cx - 32, 0, 16 * cz - 32)] = "minecraft:stone"
            if (cx, cz) != (3, 3):
                want[(16 * cx + 1 - 32, 1, 16 * cz + 1 - 32)] = \
                    "minecraft:oak_planks"
    assert cells == want
    assert schems[0].n_blocks == len(want)

    # Build B decodes to the same shape (9 planked chunks, no gap)
    s1 = decode_schem(schems[1].schem)
    assert (s1["width"], s1["height"], s1["length"]) == (
        s["width"], s["height"], s["length"])


def test_modded_world_is_flagged(spark):
    r = {(0, 0): chunk_nbt(400, True)}
    # swap planks for a modded block
    modded_palette = [
        {"Name": "minecraft:air"},
        {"Name": "minecraft:stone"},
        {"Name": "create:cogwheel"},
    ]
    ids = np.zeros(4096, dtype=np.int64)
    ids[0] = 1
    ids[1] = 2
    pal = nbt.List_(nbt.TAG_COMPOUND, [
        nbt.Compound({"Name": nbt.String(p["Name"])}) for p in modded_palette
    ])
    sec = nbt.Compound({
        "Y": nbt.Byte(0),
        "block_states": nbt.Compound({
            "palette": pal,
            "data": nbt.LongArray(pack_section(ids, n_palette=3)),
        }),
    })
    r[(0, 0)] = nbt.Compound({
        "InhabitedTime": nbt.Long(400),
        "sections": nbt.List_(nbt.TAG_COMPOUND, [sec]),
    })
    df = spark.createDataFrame(
        [(0, 0, 0, bytearray(encode_region(r)))],
        "row_idx long, rx int, rz int, content binary",
    )
    out = extract_builds(df, NATURAL)
    offenders = [r.block for r in out["modded"].collect()]
    assert offenders == ["create:cogwheel"]  # reference would abort here
