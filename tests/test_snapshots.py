"""Snapshot layer: atomic commits, VERSION AS OF, rollback, explicit
re-publish of a target version (mid-round crash recovery)."""

from text2mc_dataprocessor_spark.sources.snapshots import SnapshotTable


def test_commit_read_versions(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "tbl")
    assert not t.exists()
    v1 = t.commit(spark.range(3).toDF("id"), {"round": 0})
    v2 = t.commit(spark.range(5).toDF("id"), {"round": 1})
    assert (v1, v2) == (1, 2)
    assert t.read(spark).count() == 5
    assert t.read(spark, version=1).count() == 3  # VERSION AS OF
    assert t.manifest()["meta"]["round"] == 1
    assert t.versions() == [1, 2]


def test_rollback_and_recommit(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "tbl")
    t.commit(spark.range(3).toDF("id"))
    t.commit(spark.range(5).toDF("id"))
    t.rollback(1)
    assert t.current_version() == 1
    assert t.read(spark).count() == 3
    # explicit-version re-publish (crash recovery path)
    t.commit(spark.range(7).toDF("id"), {"redo": True}, version=2)
    assert t.current_version() == 2
    assert t.read(spark).count() == 7
    assert t.manifest()["meta"] == {"redo": True}


def test_append_history_byte_reuses_parent_dirs(spark, tmp_path):
    """Incremental commits: appended history segments and untouched data
    dirs are byte-reused across versions — only the delta is written
    (the 10^10-scale fix for full-table rewrites per checkpoint)."""
    import os

    from text2mc_dataprocessor_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path), "trace")
    t.commit(spark.range(10).selectExpr("id AS a"), {"round": 0})  # v1 base

    def files_under(path):
        out = {}
        for root, _d, fs in os.walk(path):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    v1_files = files_under(t.manifest(1)["path"])
    t.commit_append(spark.range(10, 20).selectExpr("id AS a"), {"round": 1})  # v2
    t.commit_append(spark.range(20, 25).selectExpr("id AS a"), {"round": 2})  # v3

    m3 = t.manifest(3)
    # v3 still points at v1's main dir and v2's delta dir, untouched
    assert m3["path"] == t.manifest(1)["path"]
    assert t.manifest(2)["history"][0] in m3["history"]
    assert files_under(m3["path"]) == v1_files  # byte-identical, never rewritten
    # reads union main + all history; VERSION AS OF slices correctly
    assert t.read(spark, 3).count() == 25
    assert t.read(spark, 2).count() == 20
    assert t.read(spark, 1).count() == 10
    # rollback semantics unchanged
    t.rollback(2)
    assert t.read(spark).count() == 20


def test_commit_with_history_rewrites_only_main(spark, tmp_path):
    """Queue/done-style commits: the main part is rewritten per version,
    history segments accumulate and are byte-reused."""
    from text2mc_dataprocessor_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path), "frontier")
    t.commit(spark.range(5).selectExpr("id AS a"), {"round": 0})  # v1: queue only
    t.commit_with_history(
        spark.range(3).selectExpr("id + 100 AS a"),       # new queue
        spark.range(5).selectExpr("id AS a"),             # done delta
        {"round": 1},
    )  # v2
    t.commit_with_history(
        spark.range(1).selectExpr("id + 200 AS a"),
        spark.range(3).selectExpr("id + 100 AS a"),
        {"round": 2},
    )  # v3
    m2, m3 = t.manifest(2), t.manifest(3)
    assert m2["path"] != m3["path"]                      # main rewritten
    assert m2["history"] == m3["history"][:1]            # deltas accumulate
    assert t.read_main(spark, 3).count() == 1
    assert t.read_history(spark, 3).count() == 8
    assert t.read(spark, 3).count() == 9

def _files_under(paths):
    import os

    out = {}
    for path in paths:
        for root, _d, fs in os.walk(path):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def test_bucketed_delta_commits_byte_reuse_untouched_buckets(spark, tmp_path):
    """BucketedSnapshotTable: each commit writes only its delta's
    buckets; every parent segment is carried by reference and stays
    byte-identical across versions (the extracted-table contract)."""
    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.sources.snapshots import BucketedSnapshotTable

    t = BucketedSnapshotTable(str(tmp_path), "ext", max_segments=100)

    def delta(lo, hi, bkt):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
            F.lit(bkt).cast("int").alias("_bkt"),
        )

    t.commit_delta(delta(0, 5, 0).unionByName(delta(5, 8, 1)), {"round": 0})  # v1
    v1_files = _files_under([p for ps in t.bucket_paths(1).values() for p in ps])
    t.commit_delta(delta(8, 12, 1), {"round": 1})   # v2 touches bucket 1 only
    t.commit_delta(delta(12, 13, 2), {"round": 2})  # v3 touches bucket 2 only

    paths3 = t.bucket_paths(3)
    # bucket 0 still points at its v1 segment; v1 files untouched on disk
    assert paths3[0] == t.bucket_paths(1)[0]
    assert all(
        _files_under([p]) == {
            k: v for k, v in v1_files.items() if k.startswith(p)
        } for p in t.bucket_paths(1)[0] + t.bucket_paths(1)[1]
    )
    # segment lists accumulate per bucket
    assert len(paths3[1]) == 2 and len(paths3[2]) == 1
    # reads union everything; VERSION AS OF slices correctly
    assert t.read(spark, 3).count() == 13
    assert t.read(spark, 1).count() == 8
    # key-pruned read opens only the requested buckets
    assert t.read_buckets(spark, [1], 3).count() == 7
    assert t.read_buckets(spark, [0, 2], 3).count() == 6


def test_bucketed_compaction_folds_overflowing_buckets(spark, tmp_path):
    """A bucket whose segment list exceeds max_segments is folded into
    ONE segment at commit; rows and time travel are unaffected."""
    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.sources.snapshots import BucketedSnapshotTable

    t = BucketedSnapshotTable(str(tmp_path), "ext", max_segments=3)
    for i in range(6):
        d = spark.range(i * 10, i * 10 + 4).select(
            F.col("id").alias("k"), F.lit(0).cast("int").alias("_bkt")
        )
        t.commit_delta(d, {"round": i})
    # list length stays bounded by max_segments despite 6 appends
    assert len(t.bucket_paths()[0]) <= 3
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == sorted(
        x for i in range(6) for x in range(i * 10, i * 10 + 4)
    )
    # earlier versions still read their own segment lists
    assert t.read(spark, 2).count() == 8


def test_crawl_extracted_commits_are_pure_appends(spark, corpus, tmp_path):
    """Engine-level byte-identity: across crawl rounds, every extracted
    segment referenced by version v is still referenced (and
    byte-identical) at v+1 — no crawl round rewrites extracted rows."""
    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        pages_to_spark,
        seeds_to_spark,
    )

    eng = CrawlEngine(
        spark, str(tmp_path / "c"), pages_to_spark(spark, corpus),
        config=CrawlConfig(politeness_budget=3, n_buckets=8),
    )
    eng.init(seeds_to_spark(spark, corpus))
    eng.run()
    vs = eng.t_extracted.versions()
    assert len(vs) >= 3
    for v_prev, v_next in zip(vs, vs[1:]):
        prev = eng.t_extracted.bucket_paths(v_prev)
        nxt = eng.t_extracted.bucket_paths(v_next)
        prev_paths = [p for ps in prev.values() for p in ps]
        nxt_paths = [p for ps in nxt.values() for p in ps]
        assert set(prev_paths) <= set(nxt_paths), (v_prev, v_next)
        # and the next version's only novelty is its own delta dirs
        assert all(
            f"v{v_next}-" in p for p in set(nxt_paths) - set(prev_paths)
        )


def test_fold_bakes_fills_into_rows_and_resets_logs(spark, corpus, tmp_path):
    """Every K-th commit bakes the merge-on-read raw-link/size fills
    into the extracted rows (rl_fold/sz_fold) and replaces the rawmap/
    sizes logs with their aggregated ≤1-row-per-key maps: the read view
    is unchanged (equivalence vs an unfolded run, sizes path included),
    rows at a fold version are all resolved, and the logs carry no
    history fan-in — so ``extracted_df`` aggregates only the suffix
    appended since the fold."""
    import pandas as pd

    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        pages_to_spark,
        seeds_to_spark,
    )

    pages = pages_to_spark(spark, corpus)
    seeds = seeds_to_spark(spark, corpus)
    raws = sorted({r for r in corpus.golden["raw_download_link"] if r})
    artifacts = spark.createDataFrame(
        pd.DataFrame({"url": raws, "html": [b"y" * (50 + i) for i in range(len(raws))]}),
        schema="url string, html binary",
    )
    runs = {}
    for key, k in (("plain", None), ("folded", 2)):
        eng = CrawlEngine(
            spark, str(tmp_path / key), pages,
            config=CrawlConfig(politeness_budget=3, n_buckets=8,
                               compact_history_every=k),
            artifacts=artifacts,
        )
        eng.init(seeds)
        eng.run()
        runs[key] = eng
    for name in ("extracted_df", "trace_df"):
        ga = getattr(runs["plain"], name)().toPandas()
        gb = getattr(runs["folded"], name)().toPandas()
        cols = sorted(ga.columns)
        pd.testing.assert_frame_equal(
            ga[cols].sort_values(cols).reset_index(drop=True),
            gb[cols].sort_values(cols).reset_index(drop=True),
        )
    b = runs["folded"]
    folds = [v for v in b.t_rawmap.versions() if v % 2 == 0 and v > 1]
    assert folds
    last_fold = max(folds)
    # the fold version's logs are main-only aggregated maps
    for t in (b.t_rawmap, b.t_sizes):
        assert t.manifest(last_fold).get("history", []) == []
    agg = b.t_rawmap.read_main(spark, last_fold).toPandas()
    assert agg.download_url.is_unique
    # rows at the fold version are fully resolved; rows appended after
    # are pending (NULL rl_fold) until the next fold
    at_fold = b.t_extracted.read(spark, last_fold).toPandas()
    assert at_fold.rl_fold.notna().all()
    assert (at_fold.sz_fold.dropna() > 0).any()
    # resolved values must equal the read view's at that version
    b2 = CrawlEngine.resume(
        spark, str(tmp_path / "folded"), pages,
        config=CrawlConfig(politeness_budget=3, n_buckets=8,
                           compact_history_every=2),
        version=last_fold,
    )
    view = b2.extracted_df().toPandas().set_index("url")
    for _, row in at_fold.iterrows():
        assert view.loc[row.url, "raw_download_link"] == row.rl_fold
        vsz = view.loc[row.url, "download_size"]
        assert (pd.isna(vsz) and pd.isna(row.sz_fold)) or vsz == row.sz_fold


def test_history_compaction_preserves_state_and_bounds_fanin(spark, corpus, tmp_path):
    """compact_history_every=K: every K-th commit folds the append-only
    tables' segments into one dir; final state is identical to an
    uncompacted run and rollback across the fold boundary still works."""
    import pandas as pd

    from text2mc_dataprocessor_spark.plans.crawl import CrawlConfig, CrawlEngine
    from text2mc_dataprocessor_spark.sources.fixtures import (
        pages_to_spark,
        seeds_to_spark,
    )

    pages = pages_to_spark(spark, corpus)
    seeds = seeds_to_spark(spark, corpus)
    a = CrawlEngine(
        spark, str(tmp_path / "a"), pages,
        config=CrawlConfig(politeness_budget=3, n_buckets=8,
                           compact_history_every=None),
    )
    a.init(seeds)
    a.run()
    b = CrawlEngine(
        spark, str(tmp_path / "b"), pages,
        config=CrawlConfig(politeness_budget=3, n_buckets=8,
                           compact_history_every=2),
    )
    b.init(seeds)
    b.run()

    for name in ("trace_df", "extracted_df", "frontier_df", "seen_df"):
        ga = getattr(a, name)().toPandas()
        gb = getattr(b, name)().toPandas()
        cols = sorted(ga.columns)
        pd.testing.assert_frame_equal(
            ga[cols].sort_values(cols).reset_index(drop=True),
            gb[cols].sort_values(cols).reset_index(drop=True),
        )
    # folded versions carry no history fan-in
    folded = [v for v in b.t_trace.versions() if v % 2 == 0 and v > 1]
    assert folded
    for v in folded:
        assert b.t_trace.manifest(v).get("history", []) == []
    # rollback to a pre-fold version and replay still matches
    b2 = CrawlEngine.resume(
        spark, str(tmp_path / "b"), pages,
        config=CrawlConfig(politeness_budget=3, n_buckets=8,
                           compact_history_every=2),
        version=2,
    )
    b2.run()
    ga = a.trace_df().toPandas().sort_values("dequeue_seq").reset_index(drop=True)
    gb = b2.trace_df().toPandas().sort_values("dequeue_seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(ga, gb)
