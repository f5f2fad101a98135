"""End-to-end world2vec plan: region files → qualified chunks → DBSCAN
build clusters → per-build schematic export.

This stitches the §2 voxel operators into the reference's actual
workflow (/root/reference/world2vec/world2vec.py ``get_build`` +
``extract_build``):

1. **S9** decode .mca regions → chunks + blocks (global coordinates via
   the region's P11 filename coords: chunk ``32·r + c``, block
   ``512·r + 16·c + local``).
2. **F10** inhabited gate (≥30 ticks, or field absent → keep).
3. **F9** modded abort: any block outside the ``minecraft:`` namespace
   aborts the whole extraction (the reference returns early,
   world2vec.py:226-231).
4. **F8** qualification: a chunk joins the build set iff it holds ≥1
   block whose base name (states stripped) is NOT in natural_blocks
   (world2vec.py:232-239).
5. **X5** DBSCAN(eps=5, min_samples=5) over qualified chunk coords
   (world2vec.py:313) — clusters minus noise are the builds.
6. **J4** bbox sweep: each build re-collects ALL present chunks inside
   its cluster's chunk-coordinate bbox, qualified or not
   (world2vec.py:360-377 re-sweeps the region files).
7. **S12 sink** per-build schematic: blocks of the bbox chunks, rebased
   to the build origin, air-filled (world2vec.py:396-536). With
   ``surface_trim=True`` the reference's surface-section y-heuristic
   runs first (``surface_y_offsets``/``apply_surface_trim`` — A6 mode
   surface section, A7 mean of per-chunk surface minima, sub-surface
   terrain dropped, emission stops at the first empty layer); without
   it, y simply rebases to the build's min y (the two agree on builds
   that don't sit on terrain).

Scale shape: every step is a broadcast/equi-join or the operators'
documented shapes; the only Python stages are the Arrow-batched codecs
(decode per region, encode per build) and DBSCAN's bounded matcher.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dbscan import cluster_extents, dbscan_labels
from ..operators.voxel import bbox_range_join, inhabited_gate
from ..sources.mca import mca_blocks, mca_chunks
from ..sources.schem import blocks_to_schem

#: blockstate → base name ("minecraft:stone[facing=…]" → "minecraft:stone")
def _base_name(col):
    return F.split(col, r"\[").getItem(0)


def _find_surface_section(nonair_by_s: dict, low: int, high: int,
                          superflat: bool) -> tuple[bool, int]:
    """Pure re-derivation of the reference's per-chunk surface walk
    (world2vec.py:85-118 ``find_surface_section``) over per-section
    NON-AIR counts (air = 4096 − nonair; absent section = all air).

    Scanning top→down: all-air sections skip; the first section holding
    any block becomes the tentative surface; the walk then descends
    through sections with ≥1024 air (each becomes the new tentative) and
    returns the section ABOVE the first denser one. Superflat worlds: an
    all-air section back below the tentative within 4 sections of the
    bottom is the void boundary (surface = the section above it), and a
    walk that reaches the bottom returns (superflat, low+1)."""
    surface = None
    for s in range(high, low, -1):
        air = 4096 - int(nonair_by_s.get(s, 0))
        good = False
        if surface is not None and air >= 1024:
            surface = s
            good = True
            if air == 4096 and s <= low + 4:
                return True, s + 1
        if surface is None and air != 4096:
            surface = s
        elif surface is not None and not good and not superflat:
            return superflat, s + 1
    return True, low + 1


_CHUNK_SURFACE_SCHEMA = (
    "build_id long, ccx long, ccz long, surface_section int, superflat boolean"
)


def surface_y_offsets(build_blocks: DataFrame,
                      min_section: int = -5) -> DataFrame:
    """A6/A7 — the reference's build-level surface height
    (world2vec.py:407-459): per chunk the surface section
    (``find_surface_section``), the build's MODE section over its
    chunks, then per chunk the lowest surface block (non-air with air
    above) inside [mode·16+start_y, mode·16+15], defaulting to
    ``level`` when none; ``lowest_surface_y`` = int(mean) − 1 unless the
    mode is the bottom section. Superflat builds (majority of per-chunk
    flags — the reference threads the flag sequentially through its
    chunk loop, an order-dependent carry this column-wise form replaces
    with the vote its ``superflat_markers`` mode already takes) scan
    from start_y=0 with level −100.

    ``build_blocks``: (build_id, x, y, z, block) non-air rows in global
    coords. Returns one row per build: (build_id, surface_section_mode,
    superflat, lowest_surface_y). Scale shape: two narrow aggregations
    (per chunk-section counts, per-chunk minima), a per-chunk Arrow pass
    over ≤22-row groups, and a self-anti-join for the air-above test —
    no driver loops, no full-grid densification."""
    chunked = (
        build_blocks.select("build_id", "x", "y", "z")
        .withColumn("ccx", F.floor(F.col("x") / 16))
        .withColumn("ccz", F.floor(F.col("z") / 16))
    )
    seccounts = chunked.groupBy(
        "build_id", "ccx", "ccz",
        F.floor(F.col("y") / 16).cast("int").alias("s"),
    ).agg(F.count(F.lit(1)).alias("nonair"))

    def per_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = dict(zip(pdf["s"], pdf["nonair"]))
        sf, ss = _find_surface_section(counts, min_section, 16, False)
        return pd.DataFrame(
            [(int(pdf["build_id"].iloc[0]), int(pdf["ccx"].iloc[0]),
              int(pdf["ccz"].iloc[0]), ss, sf)],
            columns=["build_id", "ccx", "ccz", "surface_section", "superflat"],
        )

    chunk_surface = seccounts.groupBy("build_id", "ccx", "ccz").applyInPandas(
        per_chunk, _CHUNK_SURFACE_SCHEMA
    )
    # A6 mode (ties → lowest section, pinned: the reference's
    # max(set, key=count) tie-break is hash-order-undefined)
    meta = (
        chunk_surface.groupBy("build_id", "surface_section")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("superflat").cast("int")).alias("n_sf"),
        )
        .groupBy("build_id")
        .agg(
            F.max_by(
                "surface_section",
                F.struct(F.col("n"), -F.col("surface_section")),
            ).alias("mode"),
            (F.sum("n_sf") * 2 > F.sum("n")).alias("superflat"),
        )
        .withColumn("start_y", F.when(F.col("superflat"), 0).otherwise(-8))
        .withColumn("level", F.when(F.col("superflat"), -100).otherwise(0))
    )
    bb = chunked.join(F.broadcast(meta), "build_id")
    cand = bb.filter(
        F.col("y").between(
            F.col("mode") * 16 + F.col("start_y"), F.col("mode") * 16 + 15
        )
    )
    # surface block = present cell with NO cell directly above (the
    # table holds non-air only, so absence above ⟺ air above)
    above = chunked.select(
        "build_id", "x", (F.col("y") - 1).alias("y"), "z"
    )
    surf = cand.join(above, ["build_id", "x", "y", "z"], "left_anti")
    chunk_low = surf.groupBy("build_id", "ccx", "ccz").agg(
        F.min("y").alias("low_y")
    )
    per_chunk_y = (
        chunk_surface.select("build_id", "ccx", "ccz")
        .join(chunk_low, ["build_id", "ccx", "ccz"], "left")
        .join(F.broadcast(meta), "build_id")
        .withColumn("chunk_y", F.coalesce("low_y", "level"))
    )
    # int(mean) truncates toward zero in the reference (Python int());
    # Spark's double→long cast matches
    return per_chunk_y.groupBy("build_id").agg(
        F.first("mode").alias("surface_section_mode"),
        F.first("superflat").alias("superflat"),
        (
            F.avg("chunk_y").cast("long")
            - F.when(F.first("mode") != F.lit(min_section + 1), 1).otherwise(0)
        ).alias("lowest_surface_y"),
    )


def apply_surface_trim(build_blocks: DataFrame,
                       min_section: int = -5) -> DataFrame:
    """The reference's y-trim during schematic emission
    (world2vec.py:460-536): keep only the contiguous run of non-empty
    layers starting at ``lowest_surface_y`` — sub-surface terrain below
    it is dropped, and the emission loop stops at the first empty layer
    (its ``empty_layers`` counter re-checks the same y, so one empty
    layer ends the build). Returns the filtered rows; the kept minimum
    y IS lowest_surface_y, so the S12 sink's min-corner rebase
    reproduces ``new_y = y − lowest_surface_y`` exactly."""
    offsets = surface_y_offsets(build_blocks, min_section)
    lsy = F.broadcast(offsets.select("build_id", "lowest_surface_y"))
    kept = build_blocks.join(lsy, "build_id").filter(
        F.col("y") >= F.col("lowest_surface_y")
    )
    ys = kept.select("build_id", "y", "lowest_surface_y").distinct()
    w = Window.partitionBy("build_id").orderBy("y")
    run = (
        ys.withColumn("rn", F.row_number().over(w))
        .filter(F.col("y") == F.col("lowest_surface_y") + F.col("rn") - 1)
        .groupBy("build_id")
        .agg(F.max("y").alias("keep_hi"))
    )
    return (
        kept.join(F.broadcast(run), "build_id")
        .filter(F.col("y") <= F.col("keep_hi"))
        .select("build_id", "x", "y", "z", "block")
    )


def extract_builds(regions: DataFrame, natural_blocks: list[str],
                   eps: float = 5.0, min_samples: int = 5,
                   min_inhabited_ticks: int = 30,
                   surface_trim: bool = False,
                   info: dict | None = None) -> dict:
    """``regions``: (row_idx long, rx int, rz int, content binary) — one
    .mca blob per row with its P11 filename coords (``read_mca_files``
    produces this shape).

    Returns ``{"schems": DataFrame, "labeled_chunks": DataFrame,
    "modded": DataFrame}``:

    - ``schems`` — (build_id, schem binary, dims, n_blocks, error): one
      Sponge schematic per DBSCAN build cluster.
    - ``labeled_chunks`` — qualified chunks with their cluster label
      (−1 = noise).
    - ``modded`` — distinct offending base names outside ``minecraft:``
      (non-empty ⇒ the reference would abort; exposed as data rather
      than a driver-side boolean so callers decide per-world instead of
      per-job — ``.limit(1).count() > 0`` reproduces the reference's
      abort verbatim).
    """
    coords = regions.select("row_idx", "rx", "rz")

    chunks = (
        mca_chunks(regions)
        .filter(F.col("error").isNull())
        .join(F.broadcast(coords), "row_idx")
        .withColumn("gcx", F.col("rx") * 32 + F.col("cx"))
        .withColumn("gcz", F.col("rz") * 32 + F.col("cz"))
    )
    kept = inhabited_gate(chunks, col="inhabited_time",
                          min_ticks=min_inhabited_ticks)

    # the decoded block table feeds three consumers (modded flag, F8
    # qualification, the final build join) — persist so the Arrow
    # decode pass runs once, and hand the cache to the caller via
    # ``info["persisted"]`` (with_global_rank convention)
    blocks = (
        mca_blocks(regions)
        .filter(F.col("error").isNull())
        .join(F.broadcast(coords), "row_idx")
        .withColumn("gx", F.col("rx") * 512 + F.col("x"))
        .withColumn("gz", F.col("rz") * 512 + F.col("z"))
        .withColumn("gcx", F.col("rx") * 32 + F.col("cx"))
        .withColumn("gcz", F.col("rz") * 32 + F.col("cz"))
        .persist()
    )
    if info is not None:
        info.setdefault("persisted", []).append(blocks)

    base = _base_name(F.col("block"))
    modded = (
        blocks.filter(~base.startswith("minecraft:"))
        .select(base.alias("block"))
        .distinct()
    )

    # F8: chunks holding at least one non-natural block (base-name match,
    # as anvil.Block.name() carries no states)
    unnatural_chunks = (
        blocks.filter(~base.isin(natural_blocks))
        .select("gcx", "gcz")
        .distinct()
    )
    qualified = kept.join(unnatural_chunks, ["gcx", "gcz"], "left_semi")

    labeled = dbscan_labels(
        qualified.select(F.col("gcx").alias("x"), F.col("gcz").alias("z")),
        eps=eps, min_samples=min_samples,
    ).withColumnRenamed("x", "gcx").withColumnRenamed("z", "gcz")

    extents = cluster_extents(
        labeled.select(F.col("gcx").alias("x"), F.col("gcz").alias("z"),
                       "label")
    )

    # J4 re-sweep: ALL present chunks inside each build's bbox
    present = chunks.select(
        F.col("gcx").alias("x"), F.col("gcz").alias("z")
    ).distinct()
    swept = bbox_range_join(extents, present).select(
        F.col("label").alias("build_id"),
        F.col("x").alias("gcx"), F.col("z").alias("gcz"),
    )

    build_blocks = blocks.join(swept, ["gcx", "gcz"]).select(
        "build_id",
        F.col("gx").alias("x"), F.col("y").alias("y"),
        F.col("gz").alias("z"), "block",
    )
    if surface_trim:
        # reference get_build/extract_build surface heuristic
        # (world2vec.py:85-118, 407-459): drop terrain below the build's
        # lowest surface y and stop at the first empty layer above
        build_blocks = apply_surface_trim(build_blocks)
    schems = blocks_to_schem(build_blocks)
    if info is None:
        # no handle was requested, so nothing would ever release the
        # block cache — materialize the lazy consumers and unpersist
        # now (``labeled`` is already localCheckpointed by dbscan)
        schems = schems.localCheckpoint(eager=True)
        modded = modded.localCheckpoint(eager=True)
        blocks.unpersist()
    return {"schems": schems, "labeled_chunks": labeled, "modded": modded}
