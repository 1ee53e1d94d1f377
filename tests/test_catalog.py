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


def test_file_count_and_binpack_rewrite(spark, tmp_path):
    """file_count() is free manifest metadata, and rewrite(read())
    binpacks per-round small-file appends (the scan coalesces tiny
    files into maxPartitionBytes splits) — CrawlJob.compact()'s
    maintenance for the robots/metrics/metadata state tables, which
    otherwise accrete one file batch per round forever."""
    t = Catalog(spark, str(tmp_path)).table("t", SCHEMA)
    for i in range(12):
        t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA))
    frag = t.file_count()
    assert frag >= 12
    before = sorted((r.k, r.v) for r in t.read().collect())
    t.rewrite(t.read())
    assert t.file_count() < frag
    assert sorted((r.k, r.v) for r in t.read().collect()) == before
    assert t.row_count() == len(before)


def test_compact_small_files_bounds_count_without_rewriting_large(
    spark, tmp_path
):
    """The fetched table's manifest-level binpack (r3 verdict next-round
    #4): sub-target files fold into ~target-sized merges, files already
    >= target are RE-REFERENCED — same path, same bytes, same inode —
    never rewritten.  Content and row_count are unchanged; rollback
    across the compaction still works."""
    import os

    t = Catalog(spark, str(tmp_path)).table("t", SCHEMA)
    # one "write-sized" file: a single append with an INCOMPRESSIBLE
    # payload-ish column (hash-chain hex — constant text would snappy
    # down below the size threshold and defeat the fixture)
    import hashlib

    def blob(i: int) -> str:
        out = []
        h = hashlib.sha256(str(i).encode())
        for _ in range(32):
            out.append(h.hexdigest())
            h = hashlib.sha256(h.digest())
        return "".join(out)

    big = spark.createDataFrame(
        [(10_000 + i, blob(i)) for i in range(200)], SCHEMA
    ).coalesce(1)
    t.append(big)
    big_files = [f for f in t._live_files() if os.path.getsize(f) >= 100_000]
    assert len(big_files) == 1
    big_stat = os.stat(big_files[0])
    # many per-round small appends
    for i in range(12):
        t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA).coalesce(1))
    frag = t.file_count()
    before = sorted((r.k, r.v) for r in t.read().collect())
    v_before = t.current_version()

    folded = t.compact_small_files(target_bytes=100_000)
    assert folded == 12
    assert t.file_count() < frag
    # the large file is re-referenced byte-identically: same path, same
    # inode, same mtime — its payload bytes were never opened
    assert big_files[0] in t._live_files()
    after_stat = os.stat(big_files[0])
    assert (after_stat.st_ino, after_stat.st_mtime_ns) == (
        big_stat.st_ino, big_stat.st_mtime_ns
    )
    assert sorted((r.k, r.v) for r in t.read().collect()) == before
    assert t.row_count() == len(before)
    # idempotent-ish: a second pass has at most the merged file to fold
    assert t.compact_small_files(target_bytes=100_000) == 0
    # time travel / rollback across the compaction
    t.rollback_to(v_before)
    assert sorted((r.k, r.v) for r in t.read().collect()) == before


def test_compact_small_files_rejects_bucketed_tables(spark, tmp_path):
    import pytest

    t = Catalog(spark, str(tmp_path)).table(
        "t", SEEN_LIKE, bucket_spec=(4, ("url_hash", "url"))
    )
    t.append(_rows(spark, 0, 10))
    with pytest.raises(ValueError):
        t.compact_small_files()


# ---------------------------------------------------------------------------
# bucketed layout (the seen table's storage-partitioned-join support)
# ---------------------------------------------------------------------------

SEEN_LIKE = T.StructType([
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
])


def _rows(spark, a, b):
    from pyspark.sql import functions as F

    return spark.range(a, b).select(
        (F.col("id") * 2654435761 % 1000000007).alias("url_hash"),
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
    )


def test_bucketed_append_read_rollback(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).table(
        "seen_b", SEEN_LIKE, bucket_spec=(8, ("url_hash", "url")))
    t.append(_rows(spark, 0, 500))
    t.append(_rows(spark, 500, 700))
    assert t.read().count() == 700
    assert t.row_count() == 700
    # contents identical to a plain read of the same rows
    want = {r.url for r in _rows(spark, 0, 700).collect()}
    assert {r.url for r in t.read().collect()} == want
    # version pin + rollback resolve to the right bytes (content token)
    assert t.read(version=1).count() == 500
    t.rollback_to(1)
    assert t.read().count() == 500
    # re-commit after rollback: same version number, different files
    t.append(_rows(spark, 900, 950))
    assert t.read().count() == 550


def test_bucketed_antijoin_is_storage_partitioned(spark, tmp_path):
    """The whole point of the layout: with broadcast disabled (the
    10^10-row regime where seen can never broadcast), the exact
    (url_hash, url) anti-join must plan with a bucket-aware scan and
    NO Exchange on the seen side — the only shuffle is the candidate
    delta's."""
    from pyspark.sql import functions as F

    from zeno_spark.operators.dedup import anti_join_seen, dedupe_against_seen

    t = Catalog(spark, str(tmp_path)).table(
        "seen_b2", SEEN_LIKE, bucket_spec=(8, ("url_hash", "url")))
    t.append(_rows(spark, 0, 2000))
    t.append(_rows(spark, 2000, 3000))
    cand = _rows(spark, 2500, 4000)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = anti_join_seen(cand, t.read())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # exactly one exchange in the whole plan: the candidate side's
        assert plan.count("Exchange") == 1
        assert "BroadcastNestedLoopJoin" not in plan
        assert j.count() == 1000  # ids 2500-2999 seen; 3000-3999 survive
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
