"""S8 archive source vs a literal re-run of the reference's
unzip-and-move loop (scraper/unzip_and_move_build_files.py) on the same
rows — NEW_FILENAME assignment (j counter, error skip, the double-dot
move name) and extracted entry bytes must match."""

import io
import os
import zipfile


from text2mc_dataprocessor_spark.sources.archive import (
    assign_new_filenames,
    unzip_and_move,
    unzip_entries,
)


def make_zip(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def reference_loop(rows):
    """The reference driver loop, minus the filesystem: returns
    NEW_FILENAME per row (None on error), j skipped on error."""
    out, j = [], 0
    for filename, ok in rows:
        try:
            if not ok:
                raise ValueError("boom")
            if filename.endswith(".zip") or filename.endswith(".rar"):
                out.append(f"build-{j}")
            else:
                suffix = os.path.splitext(filename)[-1]
                out.append(f"build-{j}.{suffix}")  # literal double dot
            j += 1
        except ValueError:
            out.append(None)
    return out


def test_unzip_entries_roundtrip_and_isolation(spark):
    z1 = make_zip({"a/b.schem": b"\x01\x02", "top.txt": b"hello"})
    z2 = make_zip({})  # valid but empty
    rows = [(0, z1), (1, b"NOT A ZIP"), (2, z2)]
    df = spark.createDataFrame(rows, "row_idx long, content binary")
    got = unzip_entries(df, bin_col="content").collect()
    by_idx = {}
    for r in got:
        by_idx.setdefault(r.row_idx, []).append(r)
    assert {(r.entry_name, bytes(r.entry_bytes), r.entry_size)
            for r in by_idx[0]} == {
        ("a/b.schem", b"\x01\x02", 2), ("top.txt", b"hello", 5)
    }
    assert by_idx[1][0].error is not None and by_idx[1][0].entry_name is None
    assert 2 not in by_idx  # empty archive → no rows


def test_new_filenames_match_reference_loop(spark):
    rows = [
        ("castle.zip", True),
        ("farm.schematic", True),
        ("broken.zip", False),   # error: j must NOT advance
        ("tower.rar", True),
        ("house.schem", True),
    ]
    want = reference_loop(rows)
    df = spark.createDataFrame(
        [(i, f, ok) for i, (f, ok) in enumerate(rows)],
        "row_idx long, filename string, ok boolean",
    )
    named = assign_new_filenames(df, ok_col="ok")
    got = {r.row_idx: r.new_filename for r in named.collect()}
    assert [got[i] for i in range(len(rows))] == want
    assert want[1] == "build-1..schematic"  # the reference's double dot


def test_unzip_and_move_end_to_end(spark):
    z_ok = make_zip({"inner/x.schem": b"S1", "readme.txt": b"R"})
    rows = [
        (0, "a.zip", z_ok),
        (1, "b.zip", b"garbage"),       # corrupt → NULL name, j skipped
        (2, "c.schem", b"RAWSCHEM"),    # plain move
    ]
    df = spark.createDataFrame(rows, "row_idx long, filename string, content binary")
    info = {}
    named, entries = unzip_and_move(df, info=info)
    names = {r.row_idx: r.new_filename for r in named.collect()}
    assert names[0] == "build-0"
    assert names[1] is None
    assert names[2] == "build-1..schem"
    ents = entries.collect()
    assert {(r.path, bytes(r.entry_bytes)) for r in ents} == {
        ("build-0/inner/x.schem", b"S1"), ("build-0/readme.txt", b"R")
    }
    for p in info.get("persisted", []):
        p.unpersist()


def test_fuzzy_token_lookup_matches_reference(spark):
    """P13 — reference find_closest_match + convert token resolution
    (world2vec_testrunner.py:34-80) on a handcrafted vocab."""
    from text2mc_dataprocessor_spark.operators.voxel import (
        find_closest_state,
        fuzzy_token_lookup,
    )

    block2tok = {
        "minecraft:stone": 1,
        "minecraft:brick_stairs": {
            "facing=north,half=top": 10,
            "facing=south,half=bottom": 11,
        },
        "minecraft:oak_door": {"open=true": 20, "open=false": 21},
    }
    cases = [
        ("minecraft:stone", 1),                                   # direct
        ("minecraft:brick_stairs[facing=south,half=bottom]", 11),  # exact
        ("minecraft:brick_stairs[half=top]", 10),                  # partial
        ("minecraft:brick_stairs[shape=straight]", 10),            # none → first key
        ("minecraft:oak_door[open=false,hinge=left]", 21),
        ("modded:widget", 4000),                                   # OOV → NIV
    ]
    # pure-function parity with the reference matcher
    assert find_closest_state(["half=top"],
                              block2tok["minecraft:brick_stairs"].keys()) \
        == "facing=north,half=top"
    assert find_closest_state(["shape=straight"],
                              block2tok["minecraft:brick_stairs"].keys()) is None

    df = spark.createDataFrame([(b,) for b, _ in cases], "block string")
    got = {r.block: r.tok for r in fuzzy_token_lookup(df, block2tok).collect()}
    for block, want in cases:
        assert got[block] == want, block
