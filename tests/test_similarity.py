"""ANN: brute-force cosine is exact; LSH variant has usable recall
against it and never fabricates neighbors."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_bruteforce_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    vecs = np.stack(pdf.embedding.map(np.asarray)).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    queries = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk_bruteforce(emb, queries, k=5).toPandas()
    norms = np.linalg.norm(vecs, axis=1)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        sims = vecs @ vecs[qi] / (norms * norms[qi])
        sims[qi] = -np.inf
        order = np.lexsort((ids, -np.round(sims, 12)))
        want = [int(ids[i]) for i in order[:5]]
        g = got[got.qid == qid].sort_values("rank")
        assert list(g.vec_id) == want, qid
        np.testing.assert_allclose(
            g.cos_sim.to_numpy(), np.sort(sims)[::-1][:5], rtol=1e-9
        )


def test_lsh_recall_and_no_fabrication(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(emb, queries, k=5).toPandas()
    approx = cosine_topk_lsh(emb, queries, dim=64, k=5, n_planes=24, n_tables=6).toPandas()

    # no fabrication: every reported similarity is the true cosine
    merged = approx.merge(exact, on=["qid", "vec_id"], suffixes=("_a", "_e"), how="inner")
    np.testing.assert_allclose(merged.cos_sim_a, merged.cos_sim_e, rtol=1e-9)

    # recall@5 of the true top-5 must be usable
    hits = tot = 0
    for qid in exact.qid.unique():
        want = set(exact[exact.qid == qid].vec_id)
        got = set(approx[approx.qid == qid].vec_id)
        hits += len(want & got)
        tot += len(want)
    recall = hits / tot
    assert recall >= 0.5, recall


def test_lsh_deterministic(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    a = cosine_topk_lsh(emb, queries, dim=64, k=5).toPandas().sort_values(["qid", "rank"])
    b = cosine_topk_lsh(emb, queries, dim=64, k=5).toPandas().sort_values(["qid", "rank"])
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_signature_paths_agree_and_high_dim_plans(spark):
    """The pandas-matmul signature path (dim ≥ 128) must emit the same
    bits as the JVM literal-expression path, and a dim=512 LSH query
    must plan and run (the literal path's plan grows O(n_planes·dim))."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.operators.similarity import (
        cosine_topk_lsh,
        with_simhash_signature,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((64, 64)).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(64), "embedding": [v.tolist() for v in vecs]})
    )
    jvm = with_simhash_signature(df, dim=64, n_planes=16, force_path="jvm")
    pdu = with_simhash_signature(df, dim=64, n_planes=16, force_path="pandas")
    a = {r.vec_id: r.sig_bits for r in jvm.select("vec_id", "sig_bits").collect()}
    b = {r.vec_id: r.sig_bits for r in pdu.select("vec_id", "sig_bits").collect()}
    assert a == b

    big = rng.standard_normal((80, 512)).astype(np.float32)
    bdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(80), "embedding": [v.tolist() for v in big]})
    )
    out = cosine_topk_lsh(bdf, bdf.filter(F.col("vec_id") < 4), dim=512, k=3)
    assert out.count() > 0


def test_ivf_recall_and_no_fabrication(spark, emb):
    from text2mc_dataprocessor_spark.operators.similarity import (
        cosine_topk_ivf,
    )

    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(emb, queries, k=5).toPandas()
    approx = cosine_topk_ivf(
        emb, queries, k=5, n_lists=8, n_probe=3, seed=7
    ).toPandas()

    # every reported similarity is the true cosine (re-rank is exact)
    merged = approx.merge(exact, on=["qid", "vec_id"],
                          suffixes=("_a", "_e"), how="inner")
    np.testing.assert_allclose(merged.cos_sim_a, merged.cos_sim_e, rtol=1e-9)

    # probing 3/8 lists must still find most of the true top-5
    hits = tot = 0
    for qid in exact.qid.unique():
        want = set(exact[exact.qid == qid].vec_id)
        got = set(approx[approx.qid == qid].vec_id)
        hits += len(want & got)
        tot += len(want)
    assert hits / tot >= 0.5, hits / tot


def test_ivf_at_rest_partition_pruning(spark, emb, tmp_path):
    """The at-rest IVF flow: corpus written partitioned by list_id, a
    query batch probes via a PARTITION FILTER — the scan must open only
    the probed list directories (inputFiles ⊆ those dirs), and results
    must match the in-memory equi-join variant exactly."""
    import pandas as pd

    from text2mc_dataprocessor_spark.operators.similarity import (
        _nearest_lists_udf,
        cosine_topk_ivf,
        cosine_topk_ivf_at_rest,
        train_ivf_centroids,
        write_ivf_index,
    )

    cents = train_ivf_centroids(emb, n_lists=8, seed=7)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk_ivf_at_rest(
        spark, path, queries, cents, k=5, n_probe=2
    )  # ≤6 distinct lists of 8 → the scan is strictly pruned
    got_pdf = got.toPandas()  # execute: scan metrics fill on execution
    # plan gate: the probed scan touches ONLY the probed lists' partitions
    probes = _nearest_lists_udf(cents, 2)
    want_lists = {
        int(l) for r in queries.select(probes(F.col("embedding")).alias("p")).collect()
        for l in r.p
    }
    def scan_metrics(node):
        # AQE wraps stages — descend through the final adaptive plan
        name = node.nodeName()
        if "AdaptiveSparkPlan" in name:
            return scan_metrics(node.executedPlan())
        if "QueryStage" in name:
            return scan_metrics(node.plan())
        out = []
        if "parquet" in name.lower():
            m = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            out.append(m)
        for i in range(node.children().length()):
            out += scan_metrics(node.children().apply(i))
        return out

    plan = got._jdf.queryExecution().executedPlan()
    scans = scan_metrics(plan)
    assert scans, "expected a parquet scan of the index"
    n_total_files = len(spark.read.parquet(path).inputFiles())
    for m in scans:
        assert m["numPartitions"] == len(want_lists), (m, want_lists)
        assert m["numFiles"] < n_total_files  # strictly pruned
    # and the plan carries the partition filter (pruning, not post-scan)
    plan_str = plan.toString()
    assert "PartitionFilters" in plan_str and "list_id" in plan_str
    # results ≡ the in-memory equi-join variant with the same index
    mem = cosine_topk_ivf(emb, queries, k=5, n_probe=2, centroids=cents)
    pd.testing.assert_frame_equal(
        got_pdf.sort_values(["qid", "rank"]).reset_index(drop=True),
        mem.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True),
    )


def test_ivf_index_reuse_and_partition_shape(spark, emb):
    """Train once, assign lists, reuse the centroid matrix: list ids
    cover [0, n_lists) and every corpus vector lands in exactly one
    list (the bucketing/partition column at rest)."""
    from text2mc_dataprocessor_spark.operators.similarity import (
        cosine_topk_ivf,
        train_ivf_centroids,
        with_ivf_list,
    )

    cents = train_ivf_centroids(emb, n_lists=8, seed=7)
    assert cents.shape[0] == 8
    listed = with_ivf_list(emb, cents)
    n = listed.count()
    assert n == emb.count()
    ids = [r.list_id for r in listed.select("list_id").distinct().collect()]
    assert all(0 <= i < 8 for i in ids)
    # reuse: passing the matrix skips retraining and is deterministic
    queries = emb.filter(F.col("vec_id") < 3)
    a = cosine_topk_ivf(emb, queries, k=5, centroids=cents).toPandas()
    b = cosine_topk_ivf(emb, queries, k=5, centroids=cents).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["qid", "rank"]).reset_index(drop=True),
        b.sort_values(["qid", "rank"]).reset_index(drop=True),
    )
