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
