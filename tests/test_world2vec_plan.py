"""End-to-end world2vec plan over synthetic regions: S9 decode → F10
gate → F8 qualification → X5 DBSCAN → J4 bbox re-sweep → S12 schematic
export, asserted against the hand-computable expected world; plus the
surface-section y-heuristic (find_surface_section walk, A6 mode / A7
mean offsets, sub-surface trim)."""

import numpy as np

from text2mc_dataprocessor_spark.functions import nbt
from text2mc_dataprocessor_spark.plans.world2vec import (
    _find_surface_section,
    apply_surface_trim,
    extract_builds,
    surface_y_offsets,
)
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


def test_find_surface_section_walk():
    """Hand-traced conformance with the reference walk
    (world2vec.py:85-118) over non-air-per-section profiles."""
    # plain terrain: full stone sections 0..3, partial 4 → surface 4
    prof = {0: 4096, 1: 4096, 2: 4096, 3: 4096, 4: 1795}
    assert _find_surface_section(prof, -5, 16, False) == (False, 4)
    # the tentative walks DOWN through airy (≥1024-air) sections and the
    # first dense one returns the section above it
    prof = {6: 10, 5: 300, 4: 4000, 3: 4096}
    assert _find_surface_section(prof, -5, 16, False) == (False, 5)
    # superflat void: an all-air section below the tentative within 4 of
    # the bottom is the void boundary
    assert _find_surface_section({0: 500}, -5, 16, False) == (True, 0)
    # walk that reaches the bottom (every section airy) → (True, low+1)
    assert _find_surface_section(
        {s: 10 for s in range(-4, 17)}, -5, 16, False
    ) == (True, -4)
    # superflat mode never early-returns at a dense section
    prof = {6: 10, 5: 300, 4: 4000, 3: 4096}
    assert _find_surface_section(prof, -5, 16, True) == (True, 0)
    # empty world: all air everywhere → bottom fallthrough
    assert _find_surface_section({}, -5, 16, False) == (True, -4)


def _terrain_chunk_nbt(inhabited=400, planks=True):
    """Five sections: Y=0..3 solid stone, Y=4 stone up to global y=70,
    plus (if ``planks``) a 3-block oak_planks column at local (1,1),
    y=71..73 — a build SEATED ON TERRAIN (the surface-trim case)."""
    secs = []
    pal = nbt.List_(nbt.TAG_COMPOUND, [
        nbt.Compound({"Name": nbt.String(p["Name"])}) for p in PALETTE
    ])
    for sy in range(5):
        ids = np.zeros(4096, dtype=np.int64)
        if sy < 4:
            ids[:] = 1  # solid stone
        else:
            ids[: 7 * 256] = 1  # stone up to local y=6 (global y 64..70)
            if planks:
                for ly in (7, 8, 9):  # global y 71..73
                    ids[ly * 256 + 1 * 16 + 1] = 2
        secs.append(nbt.Compound({
            "Y": nbt.Byte(sy),
            "block_states": nbt.Compound({
                "palette": pal,
                "data": nbt.LongArray(pack_section(ids, n_palette=len(PALETTE))),
            }),
        }))
    return nbt.Compound({
        "DataVersion": nbt.Int(3120),
        "InhabitedTime": nbt.Long(inhabited),
        "sections": nbt.List_(nbt.TAG_COMPOUND, secs),
    })


def _terrain_world(spark):
    r0 = {(cx, cz): _terrain_chunk_nbt() for cx in range(2, 5) for cz in range(2, 5)}
    return spark.createDataFrame(
        [(0, 0, 0, bytearray(encode_region(r0)))],
        "row_idx long, rx int, rz int, content binary",
    )


def test_surface_trim_drops_subsurface_terrain(spark):
    """A terrain-seated build: with surface_trim the schematic keeps the
    surface run (y 69..73 — lowest_surface_y = mean(per-chunk surface
    minima) − 1 = 69) and drops the 69 layers of terrain below; without
    it, the whole stone column ships (the documented divergence this
    flag closes)."""
    regions = _terrain_world(spark)

    # per-build offsets: every chunk's surface section is 4 (air ≥1024
    # above stone at y≤70, dense section 3 below), surface stone at
    # y=70 → mean 70, minus 1 (mode ≠ bottom section) → 69
    out = extract_builds(regions, NATURAL, surface_trim=True)
    schems = {r.build_id: r for r in out["schems"].collect()}
    assert set(schems) == {0} and schems[0].error is None
    s = decode_schem(schems[0].schem)
    assert (s["width"], s["height"], s["length"]) == (48, 5, 48)
    # 9 chunks × (2 full stone layers at y 69/70 + 3 planks)
    assert schems[0].n_blocks == 9 * (2 * 256 + 3)
    inv = {v: k for k, v in s["palette"].items()}
    names = [inv[pid] for pid in s["block_ids"] if inv[pid] != "minecraft:air"]
    assert names.count("minecraft:oak_planks") == 27
    assert names.count("minecraft:stone") == 9 * 512

    # without the trim, the terrain below the surface ships too
    out_raw = extract_builds(regions, NATURAL)
    raw = {r.build_id: r for r in out_raw["schems"].collect()}
    s_raw = decode_schem(raw[0].schem)
    assert s_raw["height"] == 74  # y 0..73
    assert raw[0].n_blocks > schems[0].n_blocks


def test_surface_trim_near_void_world_is_superflat_and_empties(spark):
    """Faithful-to-reference on the suite's sparse fixture world (a few
    blocks at y=5/6, all-air sections below within 4 of the bottom):
    every chunk's walk hits the superflat-void branch → superflat mode,
    lowest_surface_y = mean(5) − 1 = 4 — and layer 4 is EMPTY, so the
    emission loop stops immediately (the reference writes an empty
    schematic; the grouped sink simply emits no row)."""
    trimmed = extract_builds(make_world(spark), NATURAL, surface_trim=True)
    assert trimmed["schems"].count() == 0


def test_surface_y_offsets_direct(spark):
    """surface_y_offsets over a hand-made block table: one build, one
    chunk, terrain-seated (planks at y=71..73 on stone to y=70) — the
    walk, mode, surface-minima mean, and the −1 adjustment."""
    rows = []
    for x in range(16):
        for z in range(16):
            for y in range(0, 71):
                rows.append((0, x, y, z, "minecraft:stone"))
    for y in (71, 72, 73):
        rows.append((0, 1, y, 1, "minecraft:oak_planks"))
    bb = spark.createDataFrame(
        rows, "build_id long, x long, y long, z long, block string"
    )
    off = surface_y_offsets(bb).first()
    assert off.surface_section_mode == 4
    assert not off.superflat
    assert off.lowest_surface_y == 69
    kept = apply_surface_trim(bb)
    ys = sorted(r.y for r in kept.select("y").distinct().collect())
    assert ys == [69, 70, 71, 72, 73]


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
