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
