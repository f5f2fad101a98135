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
