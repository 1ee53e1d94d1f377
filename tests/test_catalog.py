"""SnapshotTable: append/rewrite/read/version-pin/rollback (the Iceberg
stand-in; reference analogue: queue file + WAL + recovery,
queue/enqueue.go:186-200, index/recovery.go:9-60)."""

from __future__ import annotations

from pyspark.sql import types as T

from zeno_spark.catalog import Catalog

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
)


def test_append_read_versions(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).table("t", SCHEMA)
    assert t.current_version() == 0
    assert t.read().count() == 0

    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))
    assert t.current_version() == 2
    assert t.read().count() == 3
    assert t.row_count() == 3
    # version pinning (time travel)
    assert t.read(version=1).count() == 2
    assert t.row_count(version=1) == 2


def test_rewrite_and_rollback(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).table("t", SCHEMA)
    t.append(spark.createDataFrame([(i, "x") for i in range(10)], SCHEMA))
    t.rewrite(t.read().filter("k < 3"))
    assert t.read().count() == 3
    assert t.row_count() == 3
    t.append(spark.createDataFrame([(99, "y")], SCHEMA))
    assert t.read().count() == 4
    # crash recovery: roll back the last two commits
    t.rollback_to(1)
    assert t.current_version() == 1
    assert t.read().count() == 10


def test_empty_append_still_advances(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).table("t", SCHEMA)
    v = t.append(spark.createDataFrame([], SCHEMA))
    assert v == 1
    assert t.read().count() == 0


def test_expire_snapshots_folds_history_and_sweeps_orphans(spark, tmp_path):
    """expire_snapshots: history below current-keep_last folds into one
    base manifest; reads at head and at every surviving version are
    unchanged; shadowed (rewrite) and rolled-back (orphan) data files
    are deleted; recent versions stay rollback-able."""
    import glob
    import os

    t = Catalog(spark, str(tmp_path)).table("t", SCHEMA)
    for i in range(6):
        t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA))
    # a compaction rewrite shadows the first 6 appends' files
    t.rewrite(t.read())
    # a crashed commit: appended then rolled back -> orphan files
    t.append(spark.createDataFrame([(99, "orphan")], SCHEMA))
    t.rollback_to(7)
    for i in range(6, 9):
        t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA))

    head = t.current_version()
    before_rows = sorted((r.k, r.v) for r in t.read().collect())
    before_count = t.row_count()
    n_files_before = len(glob.glob(f"{tmp_path}/t/data/*/*.parquet"))

    removed = t.expire_snapshots(keep_last=2)
    assert removed > 0  # shadowed + orphan files actually deleted
    assert len(glob.glob(f"{tmp_path}/t/data/*/*.parquet")) == (
        n_files_before - removed
    )
    assert t.current_version() == head
    assert sorted((r.k, r.v) for r in t.read().collect()) == before_rows
    assert t.row_count() == before_count
    # versions inside the window still readable + rollback-able
    v = head - 1
    rows_at_v = sorted((r.k, r.v) for r in t.read(v).collect())
    t.rollback_to(v)
    assert sorted((r.k, r.v) for r in t.read().collect()) == rows_at_v
    # idempotent / safe to re-run
    t.expire_snapshots(keep_last=2)
    assert sorted((r.k, r.v) for r in t.read().collect()) == rows_at_v
