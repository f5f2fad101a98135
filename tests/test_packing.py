"""Sequence packing: exact equivalence to the single-stream reference
pack, boundary-crossing docs, determinism across partition counts, and
the no-Python plan shape."""

from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.packing import pack_sequences


def _reference_pack(counts, budget):
    out, acc = [], 0
    for i, n in counts:
        out.append((i, acc, acc // budget, acc % budget))
        acc += n
    return out


def test_pack_matches_stream_reference(spark):
    counts = [(i, (i * 37) % 90 + 1) for i in range(500)]
    df = spark.createDataFrame(counts, "doc_id long, n_tokens long")
    got = sorted(
        (r.doc_id, r.tok_start, r.seq_id, r.seq_pos)
        for r in pack_sequences(df, budget=512).collect()
    )
    assert got == _reference_pack(counts, 512)


def test_pack_boundary_crossing_doc(spark):
    # doc 1 (60 tokens) starts at 50 in seq 0 and crosses into seq 1 —
    # it belongs to seq 0 (split-on-read layout)
    df = spark.createDataFrame(
        [(0, 50), (1, 60), (2, 10)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r for r in pack_sequences(df, budget=100).collect()}
    assert (rows[0].seq_id, rows[0].seq_pos) == (0, 0)
    assert (rows[1].seq_id, rows[1].seq_pos) == (0, 50)
    assert (rows[2].seq_id, rows[2].seq_pos) == (1, 10)


def test_pack_deterministic_across_partitioning(spark):
    counts = [(i, (i * 13) % 40 + 1) for i in range(300)]
    df = spark.createDataFrame(counts, "doc_id long, n_tokens long")
    a = sorted(tuple(r) for r in pack_sequences(df, 128, n_partitions=2).collect())
    b = sorted(tuple(r) for r in pack_sequences(df, 128, n_partitions=16).collect())
    assert a == b


def test_pack_info_and_plan(spark):
    df = spark.createDataFrame([(i, 5) for i in range(100)], "doc_id long, n_tokens long")
    info: dict = {}
    out = pack_sequences(df, 64, info=info)
    assert out.count() == 100
    assert info["total_tokens"] == 500
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for c in info["persisted"]:
        c.unpersist()
