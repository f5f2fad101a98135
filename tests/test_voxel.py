"""Voxel operators (world2vec stage re-expressed relationally)."""

import json

import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators import voxel as V


def test_schematic_json_source(spark, tmp_path):
    doc = {
        "worldDimensions": {"width": 2, "height": 1, "length": 2},
        "blocks": [
            {"name": "minecraft:stone", "x": 0, "y": 0, "z": 0},
            {"name": "minecraft:dirt", "x": 1, "y": 0, "z": 1},
        ],
    }
    p = tmp_path / "b.json"
    p.write_text(json.dumps(doc))
    out = V.read_schematic_json(spark, str(p)).toPandas()
    assert len(out) == 2
    assert set(out.block) == {"minecraft:stone", "minecraft:dirt"}
    assert out.width.iloc[0] == 2


def test_region_codec_round_trip(spark):
    df = spark.createDataFrame([(3, -7), (-1, 0)], "x int, z int")
    out = df.withColumn("fn", V.region_filename("x", "z")).withColumn(
        "rc", V.region_coords("fn")
    )
    rows = {(r.x, r.z): (r.fn, r.rc.rx, r.rc.rz) for r in out.collect()}
    assert rows[(3, -7)] == ("r.3.-7.mca", 3, -7)
    assert rows[(-1, 0)] == ("r.-1.0.mca", -1, 0)


def test_canonical_blockstate(spark):
    df = spark.createDataFrame(
        [("minecraft:log", {"axis": "y", "variant": "oak"}),
         ("minecraft:stone", {}),
         ("minecraft:water", None)],
        "block string, state map<string,string>",
    )
    got = {r.block: r.c for r in df.withColumn(
        "c", V.canonical_blockstate("block", "state")
    ).collect()}
    assert got["minecraft:log"] == "minecraft:log[axis=y,variant=oak]"
    assert got["minecraft:stone"] == "minecraft:stone"
    assert got["minecraft:water"] == "minecraft:water"


def test_token_lookup_oov_default(spark):
    df = V.synthetic_build(spark, side=4)
    toks = V.token_lookup(df, {"minecraft:stone": 1, "minecraft:dirt": 2})
    got = toks.groupBy("tok").count().toPandas().set_index("tok")["count"]
    assert got[1] > 0 and got[2] > 0 and got[-1] > 0  # OOV → -1


def test_unnatural_filter_and_modded_abort(spark):
    base = V.synthetic_build(spark, side=4)
    df = base.withColumn("chunk", (F.col("x") / 2).cast("int"))
    flags = V.has_unnatural_blocks(
        df, ["minecraft:stone", "minecraft:dirt", "minecraft:air", "minecraft:water"],
        ["chunk"],
    ).toPandas()
    assert flags.has_unnatural.any()
    assert not V.modded_abort(base)
    df2 = base.union(spark.createDataFrame([(0, 0, 0, "mod:weird")], V.BLOCK_SCHEMA))
    assert V.modded_abort(df2)


def test_bbox_range_join(spark):
    chunks = spark.createDataFrame(
        [(x, z) for x in range(6) for z in range(6)], "x int, z int"
    )
    clusters = spark.createDataFrame(
        [(0, 0, 2, 0, 2), (1, 4, 5, 4, 5)],
        "cluster_id int, low_x int, high_x int, low_z int, high_z int",
    )
    out = V.bbox_range_join(clusters, chunks).groupBy("cluster_id").count().toPandas()
    got = dict(zip(out.cluster_id, out["count"]))
    assert got == {0: 9, 1: 4}


def test_neighborhood_pairs_interior_count(spark):
    df = V.synthetic_build(spark, side=4)
    pairs = V.neighborhood_pairs(df)
    # total pair count: each ordered (target, neighbor-in-grid) pair once
    n = pairs.count()
    # interior blocks (2³ of them in 4³) have 26 neighbors each;
    # corner blocks have 7. Spot-check the global count bounds.
    assert 4**3 * 7 <= n <= 4**3 * 26
    # corner (0,0,0) has exactly 7 in-grid neighbors
    corner = V.neighborhood_pairs(
        df.filter((F.col("x") < 2) & (F.col("y") < 2) & (F.col("z") < 2))
    )
    assert corner.count() == 8 * 7 - 8 * 0  # 2³ cube: each has 7 neighbors


def test_frequency_subsample_deterministic_and_biased(spark):
    df = V.synthetic_build(spark, side=8)
    a = V.frequency_subsample(df, t=1e-2, seed=17)
    b = V.frequency_subsample(df, t=1e-2, seed=17)
    assert a.count() == b.count()
    assert 0 < a.count() < df.count()  # frequent blocks get dropped


def test_mode_and_extents(spark):
    df = V.synthetic_build(spark, side=4).union(
        spark.createDataFrame([(9, 9, 9, "minecraft:stone")], V.BLOCK_SCHEMA)
    )
    assert V.mode_of(df, "block").first()[0] == "minecraft:stone"
    ext = V.build_extents(df).first()
    assert (ext.low_x, ext.high_x, ext.high_y, ext.high_z) == (0, 9, 9, 9)
