"""Snapshot-committed parquet tables — a local stand-in for Iceberg.

The reference persists its frontier as an append-only file + host index +
write-ahead log with group-committed fsyncs and crash recovery by WAL
replay (/root/reference/internal/pkg/queue/enqueue.go:186-200,
index/wal.go, index/recovery.go:9-60).  On a cluster all of that is
exactly what Iceberg's commit protocol provides; this sandbox image has
no Iceberg jars, so this module implements the minimal subset we need
with the same semantics:

  * append       — write new parquet files, then atomically publish a
                   numbered JSON manifest (os.rename is the commit point,
                   like Iceberg's metadata-pointer swap)
  * rewrite      — replace the table's live file set (compaction)
  * read         — union of data files reachable from the latest manifest
  * version pin  — readers/resume can pin to any committed version
  * rollback     — drop manifests above a watermark (crash cleanup)

Production swap-in: replace SnapshotTable with `df.writeTo(name).append()`
on an Iceberg catalog; `rewrite` becomes a compaction/`RewriteDataFiles`
action; version pinning becomes time-travel (`VERSION AS OF`).

Deletes are modelled the Iceberg way — as *delete sets* materialized by
the caller (see plans/crawl.py: the `claimed` table is an equality-delete
set against `frontier`, merged on read via anti-join and folded in by
periodic compaction).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class SnapshotTable:
    """One table under ``<warehouse>/<name>`` with atomic numbered commits."""

    def __init__(self, spark: SparkSession, warehouse: str, name: str, schema: T.StructType):
        self.spark = spark
        self.name = name
        self.schema = schema
        self.root = os.path.join(warehouse, name)
        self.manifest_dir = os.path.join(self.root, _MANIFEST_DIR)
        self.data_dir = os.path.join(self.root, _DATA_DIR)
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- commit log ---------------------------------------------------------

    def _manifest_versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.manifest_dir):
            if f.endswith(".json"):
                try:
                    out.append(int(f[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int:
        """Latest committed version; 0 = empty table."""
        versions = self._manifest_versions()
        return versions[-1] if versions else 0

    def _read_manifest(self, version: int) -> dict:
        with open(os.path.join(self.manifest_dir, f"{version:010d}.json")) as fh:
            return json.load(fh)

    def _live_files(self, version: int | None = None) -> list[str]:
        version = self.current_version() if version is None else version
        files: list[str] = []
        for v in self._manifest_versions():
            if v > version:
                break
            m = self._read_manifest(v)
            if m["op"] == "rewrite":
                files = list(m["added"])
            else:
                files.extend(m["added"])
        return files

    def _commit(self, op: str, added: list[str], rows: int) -> int:
        version = self.current_version() + 1
        manifest = {"op": op, "added": added, "rows": rows, "version": version}
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.manifest_dir, f"{version:010d}.json"))  # commit point
        return version

    # -- write paths --------------------------------------------------------

    def _write_files(self, df: DataFrame) -> tuple[list[str], int]:
        out = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(out)
        files = [
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet") and not f.startswith(".")
        ]
        # row count from parquet footers (no extra job over the data)
        rows = 0
        if files:
            import pyarrow.parquet as pq

            rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        return files, rows

    def append(self, df: DataFrame) -> int:
        """Append rows; returns the new committed version."""
        files, rows = self._write_files(df)
        if not files or rows == 0:
            # still commit an empty append so round watermarks advance
            return self._commit("append", [], 0)
        return self._commit("append", files, rows)

    def rewrite(self, df: DataFrame) -> int:
        """Replace all live data (compaction / overwrite)."""
        files, rows = self._write_files(df)
        return self._commit("rewrite", files, rows)

    def truncate(self) -> int:
        return self._commit("rewrite", [], 0)

    # -- read paths ----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        files = self._live_files(version)
        if not files:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*files)

    def row_count(self, version: int | None = None) -> int:
        """Exact row count from manifest metadata — no Spark job."""
        version = self.current_version() if version is None else version
        total = 0
        for v in self._manifest_versions():
            if v > version:
                break
            m = self._read_manifest(v)
            if m["op"] == "rewrite":
                total = m["rows"]
            else:
                total += m["rows"]
        return total

    # -- recovery -------------------------------------------------------------

    def rollback_to(self, version: int) -> None:
        """Drop manifests above ``version`` (orphan data files are left on
        disk, as Iceberg does until snapshot expiration)."""
        for v in self._manifest_versions():
            if v > version:
                os.remove(os.path.join(self.manifest_dir, f"{v:010d}.json"))

    # -- maintenance ----------------------------------------------------------

    def expire_snapshots(self, keep_last: int = 16) -> int:
        """Iceberg `expireSnapshots` analogue: fold history older than
        ``current - keep_last`` into a single base manifest and delete
        data files no remaining manifest references (rewrite shadows +
        rollback orphans).  Versions within ``keep_last`` of the head
        stay time-travelable / rollback-able — callers must keep that
        window at least as deep as their recovery watermark (the crawl
        keeps every round marker's versions inside it).  Returns the
        number of data files deleted.

        Crash-safe ordering: the folded base manifest is atomically
        renamed into place FIRST (a rewrite-op manifest shadows every
        older one on read), so a crash between the steps leaves a
        consistent, merely-unexpired table."""
        versions = self._manifest_versions()
        if not versions:
            return 0
        floor = self.current_version() - keep_last
        to_fold = [v for v in versions if v <= floor]
        if to_fold:
            base_files = self._live_files(floor_v := to_fold[-1])
            base_rows = self.row_count(floor_v)
            manifest = {"op": "rewrite", "added": base_files,
                        "rows": base_rows, "version": floor_v}
            tmp = os.path.join(
                self.manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.rename(
                tmp, os.path.join(self.manifest_dir, f"{floor_v:010d}.json"))
            for v in to_fold[:-1]:
                os.remove(os.path.join(self.manifest_dir, f"{v:010d}.json"))
        # orphan sweep: any data file not referenced by a live manifest
        referenced: set[str] = set()
        for v in self._manifest_versions():
            referenced.update(self._read_manifest(v)["added"])
        removed = 0
        for d in os.listdir(self.data_dir):
            sub = os.path.join(self.data_dir, d)
            if not os.path.isdir(sub):
                continue
            for f in os.listdir(sub):
                p = os.path.join(sub, f)
                if f.endswith(".parquet") and p not in referenced:
                    os.remove(p)
                    removed += 1
                elif f.startswith(".") or f.endswith(".crc") or f == "_SUCCESS":
                    # writer sidecars are dead weight once expired files go
                    if not any(r.startswith(sub + os.sep) for r in referenced):
                        os.remove(p)
            if not os.listdir(sub):
                os.rmdir(sub)
        return removed


class Catalog:
    """Namespace of SnapshotTables under one warehouse directory."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._tables: dict[str, SnapshotTable] = {}

    def table(self, name: str, schema: T.StructType) -> SnapshotTable:
        if name not in self._tables:
            self._tables[name] = SnapshotTable(self.spark, self.warehouse, name, schema)
        return self._tables[name]
