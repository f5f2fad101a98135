"""Physical-plan quality gates: predicate pushdown reaches the parquet
scan, column pruning holds, small dims broadcast, and the extraction
stage carries no row-at-a-time Python UDFs."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: scan schema holds only the 3 needed columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_small_dim_broadcasts(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    q = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    assert "BroadcastHashJoin" in _plan(q)


def test_semi_and_anti_join_strategies(spark):
    from text2mc_dataprocessor_spark.queries import anti_join_unseen, semi_join_downloaded

    anti = _plan(anti_join_unseen(spark, SF_DIR))
    semi = _plan(semi_join_downloaded(spark, SF_DIR))
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_extraction_stage_is_arrow_not_row_python(spark, corpus):
    """The fetch/extract path must use Arrow-batched eval (mapInArrow /
    ArrowEvalPython), never row-at-a-time BatchEvalPython."""
    from text2mc_dataprocessor_spark.functions.extract import (
        extract_all_arrow_factory,
        extract_all_schema,
        extract_detail_udf,
    )
    from text2mc_dataprocessor_spark.sources.fixtures import pages_to_spark

    pages = pages_to_spark(spark, corpus).withColumn("kind", F.lit("detail")).withColumn(
        "parent_url", F.lit(None).cast("string")
    )
    single_pass = pages.select("url", "kind", "html", "parent_url").mapInArrow(
        extract_all_arrow_factory(["parent_url"]),
        extract_all_schema("parent_url string"),
    )
    p1 = _plan(single_pass)
    assert "PythonMapInArrow" in p1 or "MapInArrow" in p1
    assert "BatchEvalPython" not in p1

    scalar = pages.withColumn("d", extract_detail_udf("url", "html"))
    p2 = _plan(scalar)
    assert "ArrowEvalPython" in p2
    assert "BatchEvalPython" not in p2


def test_partial_aggregation_on_relational_path(spark):
    """Map-side combine before the exchange (one shuffle of 6 grouped
    rows, not 60k lineitems) + scan-level pushdown on the same query."""
    from text2mc_dataprocessor_spark.queries import lineitem_pricing_summary

    plan = _plan(lineitem_pricing_summary(spark, SF_DIR))
    assert "partial_sum" in plan  # map-side combine below the Exchange
    assert "PushedFilters: [" in plan and "l_shipdate" in plan


def test_dbscan_neighbor_search_is_equi_join(spark):
    """X5: the eps-cell decomposition must plan the neighbor search as a
    hash/sort equi-join on the cell key — never a cartesian/BNL join —
    and the distance predicate rides the join, not a product filter."""
    from text2mc_dataprocessor_spark.operators.dbscan import _neighbor_pairs

    pts = (
        spark.range(200)
        .select(
            (F.col("id") % 20).cast("int").alias("x"),
            (F.col("id") / 20).cast("int").alias("z"),
        )
        .groupBy("x", "z")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("cx", F.floor(F.col("x") / 5.0))
        .withColumn("cz", F.floor(F.col("z") / 5.0))
        .withColumn("pid", F.xxhash64("x", "z"))
    )
    plan = _plan(_neighbor_pairs(pts, 5.0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_lookup_broadcasts_distinct_domain(spark):
    """P13: the Python matcher output (distinct blockstates) must fan
    back via a broadcast join; the UDF itself is Arrow-batched."""
    from text2mc_dataprocessor_spark.operators.voxel import fuzzy_token_lookup

    df = spark.range(100).select(
        F.concat(F.lit("minecraft:b"), (F.col("id") % 7).cast("string")).alias("block")
    )
    plan = _plan(fuzzy_token_lookup(df, {"minecraft:b0": 1}))
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_schem_and_mca_sources_are_map_in_pandas(spark):
    """S9/S12: binary decode stages are Arrow mapInPandas, and the
    upstream projection reaches the scan (only row_idx + content)."""
    from text2mc_dataprocessor_spark.sources.mca import mca_chunks
    from text2mc_dataprocessor_spark.sources.schem import schem_blocks

    df = spark.createDataFrame(
        [(1, bytearray(b"x"), "extra")], "row_idx long, content binary, junk string"
    )
    for src in (schem_blocks, mca_chunks):
        plan = _plan(src(df))
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
