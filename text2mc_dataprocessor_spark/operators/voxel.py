"""Voxel-pipeline operators (the reference's world2vec stage),
re-expressed as relational Spark ops over an exploded block table
``(x int, y int, z int, block string, state map<string,string>)``.

The reference iterates .mca region files chunk-by-chunk in Python
(/root/reference/world2vec/world2vec.py). Binary .mca parsing needs
anvil-parser (not in this container) — the *operators* it applies are
what the engine provides, over block tables from the JSON form the
reference's Java loader emits (schematic-loader FileHandler.java:27-50)
or any other source:

- S10  JSON schematic source: ``{"worldDimensions":…, "blocks":[{name,x,y,z}…]}``
       → explode(blocks) (world2vec.py:546-566)
- P11  region-filename codec r.{x}.{z}.mca ↔ ints (world2vec.py:241-250)
- P12  blockstate canonicalization name[k=v,…], keys sorted (world2vec.py:497-519)
- J3   block2tok dictionary lookup, OOV → −1 (world2vecDriver.py:225-241)
- F8   natural-block anti-filter (world2vec.py:127-131, 232-239)
- F9   modded-block abort (world2vec.py:224-231)
- J4   bbox range join: chunks within cluster extents (world2vec.py:341-344, 366-377)
- A6-A10  mode / mean / extents / frequency / distinct labels
- X6   radius-1 26-neighbor context pairs (block2vec_dataset.py:54-68)
- X7   frequency-based subsampling, p_keep = (sqrt(f/t)+1)·(t/f)
       (text2mc_block2vec.py:29-33)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BLOCK_SCHEMA = "x int, y int, z int, block string"


# -- S10: JSON schematic source ------------------------------------------------

def read_schematic_json(spark, path: str) -> DataFrame:
    """Load the Java loader's JSON form and explode to block rows."""
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(
        F.col("worldDimensions.width").alias("width"),
        F.col("worldDimensions.height").alias("height"),
        F.col("worldDimensions.length").alias("length"),
        F.explode("blocks").alias("b"),
    ).select(
        "width", "height", "length",
        F.col("b.x").cast("int").alias("x"),
        F.col("b.y").cast("int").alias("y"),
        F.col("b.z").cast("int").alias("z"),
        F.col("b.name").alias("block"),
    )


# -- P11: region filename codec ---------------------------------------------------

def region_filename(x: Column | str, z: Column | str) -> Column:
    cx = F.col(x) if isinstance(x, str) else x
    cz = F.col(z) if isinstance(z, str) else z
    return F.format_string("r.%d.%d.mca", cx, cz)


def region_coords(filename: Column | str) -> Column:
    """→ struct(rx int, rz int) parsed from 'r.{x}.{z}.mca'."""
    c = F.col(filename) if isinstance(filename, str) else filename
    return F.struct(
        F.regexp_extract(c, r"^r\.(-?\d+)\.(-?\d+)\.mca$", 1).cast("int").alias("rx"),
        F.regexp_extract(c, r"^r\.(-?\d+)\.(-?\d+)\.mca$", 2).cast("int").alias("rz"),
    )


# -- P12: blockstate canonicalization --------------------------------------------

def canonical_blockstate(block: Column | str, state: Column | str) -> Column:
    """``name[k1=v1,k2=v2]`` with keys sorted; bare name when no state."""
    b = F.col(block) if isinstance(block, str) else block
    s = F.col(state) if isinstance(state, str) else state
    kv = F.array_sort(
        F.transform(
            F.map_entries(s), lambda e: F.concat_ws("=", e["key"], e["value"])
        )
    )
    return F.when(
        s.isNull() | (F.size(F.map_entries(s)) == 0), b
    ).otherwise(F.concat(b, F.lit("["), F.array_join(kv, ","), F.lit("]")))


# -- J3: token dictionary lookup ---------------------------------------------------

def token_lookup(df: DataFrame, block2tok: dict[str, int],
                 block_col: str = "block", out: str = "tok",
                 default: int = -1) -> DataFrame:
    """Broadcast map lookup with OOV default (−1, world2vecDriver.py:237).
    The dict travels once as a map literal — never re-read per element
    (the reference reloads the JSON per call, world2vecDriver.py:228-230)."""
    m = F.create_map(*[F.lit(x) for kv in block2tok.items() for x in kv])
    return df.withColumn(
        out, F.coalesce(F.element_at(m, F.col(block_col)), F.lit(default))
    )


# -- P13: fuzzy blockstate match ----------------------------------------------------

def find_closest_state(query_states: list[str], options) -> str | None:
    """Reference ``find_closest_match`` (world2vec_testrunner.py:34-49):
    score each candidate key by |shared whole-state strings| (candidate
    split on ','), strictly-greater comparison keeps the FIRST best in
    iteration order, zero overlap → None. Pure function; the Spark wrap
    is ``fuzzy_token_lookup``."""
    qw = set(query_states)
    best, mx = None, 0
    for opt in options:
        m = len(qw & set(opt.split(",")))
        if m > mx:
            best, mx = opt, m
    return best


def fuzzy_token_lookup(df: DataFrame, block2tok: dict,
                       block_col: str = "block", out: str = "tok",
                       niv_tok: int = 4000) -> DataFrame:
    """P13 — token lookup with fuzzy blockstate resolution
    (world2vec_testrunner.py:34-49,73-80 + world2vecDriver.py:225-241).

    ``block2tok`` values are either ints (direct) or dicts keyed by
    comma-joined state strings. Per blockname ``name[s1,s2,…]``:
    missing name → NIV_TOK (4000); dict value → fuzzy-match states
    against its keys, no overlap → FIRST key (reference default branch);
    direct value → itself.

    Scale shape: the Python matcher runs only on the DISTINCT block
    -state domain (bounded vocabulary, ~10³-10⁴ strings even at corpus
    scale — not per voxel), then a broadcast equi-join fans the tokens
    back onto the block table. The dict ships once in the UDF closure.
    """

    def _tok_one(s: str) -> int:
        name, states = s, []
        if "[" in s:
            # reference parse: replace('[', ','), strip ']', split(',')
            parts = s.replace("[", ",").replace("]", "").split(",")
            name, states = parts[0], parts[1:]
        v = block2tok.get(name)
        if v is None:
            return niv_tok
        if isinstance(v, dict):
            m = find_closest_state(states, v.keys())
            if m is None:
                m = next(iter(v.keys()))  # reference default: first key
            return int(v[m])
        return int(v)

    @F.pandas_udf("int")
    def tok_udf(col: pd.Series) -> pd.Series:
        return col.map(_tok_one).astype("int32")

    distinct = df.select(F.col(block_col).alias(block_col)).distinct()
    mapped = distinct.withColumn(out, tok_udf(F.col(block_col)))
    return df.join(F.broadcast(mapped), block_col, "left")


# -- F8/F9: qualification filters --------------------------------------------------

def has_unnatural_blocks(df: DataFrame, natural_blocks: list[str],
                         group_cols: list[str]) -> DataFrame:
    """F8 — per group (chunk), TRUE iff any block ∉ natural list."""
    return df.groupBy(*group_cols).agg(
        F.max((~F.col("block").isin(natural_blocks)).cast("int")).alias("_any")
    ).select(*group_cols, (F.col("_any") == 1).alias("has_unnatural"))


def modded_abort(df: DataFrame, prefix: str = "minecraft") -> bool:
    """F9 — abort the whole build iff any block name lacks the prefix."""
    n = df.filter(~F.col("block").startswith(prefix)).limit(1).count()
    return n > 0


# -- F10/F11: chunk/region admission gates ------------------------------------------

MIN_INHABITED_TICKS = 30  # 1.5 s at 20 ticks/s (world2vec.py:141-144)


def inhabited_gate(df: DataFrame, col: str = "inhabited_time",
                   min_ticks: int = MIN_INHABITED_TICKS) -> DataFrame:
    """F10 — keep chunks players actually visited: InhabitedTime ≥ 1.5 s
    (30 ticks), or the field absent/NULL (older worlds lack it — the
    reference treats a missing field as pass:
    /root/reference/world2vec/world2vec.py:141-144, 176-194). At scan
    time this predicate is exactly a zone-map skip: Parquet column
    min/max stats prune whole row groups of unvisited chunks."""
    c = F.col(col)
    return df.filter(c.isNull() | (c >= F.lit(min_ticks)))


def nonempty_region_gate(df: DataFrame, count_col: str = "n_chunks") -> DataFrame:
    """F11 — skip empty region files (``region.data`` falsy,
    world2vec.py:150-151): keep regions with a non-zero chunk payload."""
    c = F.col(count_col)
    return df.filter(c.isNotNull() & (c > 0))


# -- J4: bbox range join -------------------------------------------------------------

def bbox_range_join(clusters: DataFrame, chunks: DataFrame) -> DataFrame:
    """clusters(cluster_id, low_x, high_x, low_z, high_z) ⨝ chunks(x, z)
    on containment — broadcast the (small) cluster-bounds side so the
    interval predicate never cross-joins two large relations."""
    return chunks.join(
        F.broadcast(clusters),
        (F.col("x") >= F.col("low_x")) & (F.col("x") <= F.col("high_x"))
        & (F.col("z") >= F.col("low_z")) & (F.col("z") <= F.col("high_z")),
    )


# -- A6-A10 ---------------------------------------------------------------------------

def mode_of(df: DataFrame, col: str) -> DataFrame:
    """A6 — most frequent value, deterministic tie-break on the value.
    Two-phase distributed rank: post-aggregation cardinality is small,
    but nothing should funnel through a single-partition window."""
    from .frontier import with_global_rank

    freq = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    ranked = with_global_rank(freq, [F.col("n").desc(), F.col(col)], out="rn")
    return ranked.filter(F.col("rn") == 1).select(col)


def build_extents(df: DataFrame) -> DataFrame:
    """A8 — bbox over coords (cluster extents, world2vec.py:341-344)."""
    return df.agg(
        F.min("x").alias("low_x"), F.max("x").alias("high_x"),
        F.min("y").alias("low_y"), F.max("y").alias("high_y"),
        F.min("z").alias("low_z"), F.max("z").alias("high_z"),
    )


def block_frequencies(df: DataFrame) -> DataFrame:
    """A9 — counts per block over a build (block2vec_dataset.py:85-93)."""
    return df.groupBy("block").agg(F.count(F.lit(1)).alias("n"))


# -- X6: 26-neighbor context ---------------------------------------------------------

def neighborhood_pairs(df: DataFrame, radius: int = 1) -> DataFrame:
    """(target, context) pairs from the radius-1 3D window — explode each
    block over its 26 offsets and equi-join back on the shifted coords
    (shuffle on exact coordinates; no theta join)."""
    offsets = [
        (dx, dy, dz)
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
        for dz in range(-radius, radius + 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dz).alias("dz"))
            for dx, dy, dz in offsets
        ])
    ).alias("o")
    probes = df.select("block", "x", "y", "z", off).select(
        F.col("block").alias("target"),
        (F.col("x") + F.col("o.dx")).alias("nx"),
        (F.col("y") + F.col("o.dy")).alias("ny"),
        (F.col("z") + F.col("o.dz")).alias("nz"),
    )
    ctx = df.select(
        F.col("x").alias("nx"), F.col("y").alias("ny"), F.col("z").alias("nz"),
        F.col("block").alias("context"),
    )
    return probes.join(ctx, ["nx", "ny", "nz"]).select("target", "context")


# -- X7: frequency-based subsampling ------------------------------------------------

def frequency_subsample(df: DataFrame, t: float = 1e-3, seed: int = 17) -> DataFrame:
    """Keep a block with p = (sqrt(f/t)+1)·(t/f) where f is its corpus
    frequency (text2mc_block2vec.py:29-33). Seeded rand → reproducible."""
    total = df.count()
    freqs = block_frequencies(df).withColumn("f", F.col("n") / F.lit(float(total)))
    keep_p = (F.sqrt(F.col("f") / t) + 1) * (t / F.col("f"))
    freqs = freqs.select("block", F.least(keep_p, F.lit(1.0)).alias("p_keep"))
    return (
        df.join(F.broadcast(freqs), "block")
        .filter(F.rand(seed) < F.col("p_keep"))
        .drop("p_keep")
    )


# -- A10: distinct label set / U2: region set-union ---------------------------------

def distinct_labels(df: DataFrame, label_col: str = "label",
                    noise: int = -1) -> DataFrame:
    """A10 — ``set(labels)`` minus the DBSCAN noise label
    (world2vec/world2vec.py:316-322). Map-side partial distinct; one
    shuffle on the (tiny) label domain."""
    return df.filter(F.col(label_col) != noise).select(label_col).distinct()


def region_set_union(*dfs: DataFrame, col: str = "region_file") -> DataFrame:
    """U2 — set-union of region-file memberships accumulated across
    passes (world2vec/world2vec.py:240-299,347-357). union is a zero
    -shuffle concat of scans; the single shuffle is the final distinct
    on the region-filename domain (bounded: one row per 512×512 region,
    ~10^5 even at continent scale)."""
    if not dfs:
        raise ValueError("region_set_union needs at least one input")
    out = dfs[0].select(col)
    for d in dfs[1:]:
        out = out.unionByName(d.select(col))
    return out.distinct()


# -- deterministic synthetic build ------------------------------------------------------

_VOCAB = [
    "minecraft:stone", "minecraft:dirt", "minecraft:air", "minecraft:oak_planks",
    "minecraft:glass", "minecraft:stone_bricks", "minecraft:water",
]


def synthetic_build(spark, side: int = 16) -> DataFrame:
    """side³ deterministic block grid (names cycle through a vocab)."""
    d = F.col("id")
    return spark.range(side ** 3).select(
        (d % side).cast("int").alias("x"),
        ((d / side).cast("long") % side).cast("int").alias("y"),
        (d / (side * side)).cast("int").alias("z"),
        F.element_at(
            F.array(*[F.lit(b) for b in _VOCAB]), (d % len(_VOCAB)).cast("int") + 1
        ).alias("block"),
    )
