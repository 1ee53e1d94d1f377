"""CDXJ index over the WARC sink (archive-replay interop, S6 adjunct).

The reference's output is consumed through standard web-archive
tooling: its recording client writes WARCs (crawl/crawl.go:101-119) and
every replay/lookup stack on top of WARCs (pywb, OpenWayback) resolves
a URL+time to a record via a **CDX(J) index** — sorted lines of

    <SURT key> <14-digit timestamp> <JSON: url digest mime status
                                      offset length filename>

where ``offset``/``length`` are the byte extent of the record's OWN
gzip member inside the ``.warc.gz`` file, so replay seeks and
decompresses exactly one record without scanning the container.  That
seekability is why ``WarcWriter`` frames one gzip member per record
(the concatenated-member layout; see warc.py) — this module closes the
loop so a user migrating off the reference keeps their CDX tooling:

  * ``surt(url)``    — Sort-friendly URI Reordering Transform (public
    format: lowercase, host labels reversed with commas, default port
    dropped, query params sorted) so lexicographic order groups a
    host's captures together; subset documented on the function.
  * ``cdxj_index``   — distributed indexer: ``binaryFile`` scan over
    ``*.warc.gz`` -> per-file Arrow worker that walks gzip member
    boundaries (zlib, zero-copy memoryview) and parses only record
    headers.  One task per file, no shuffle; WARC rotation
    (1 GB default, cmd/get.go:80-82) bounds per-task memory.
  * ``write_cdxj``   — range-partitions by (surt, ts) and writes
    globally sorted ``.cdxj`` shard files (shard N's last key <=
    shard N+1's first key, the split-index layout lookup servers
    binary-search), with the same two-phase attempt-safe job commit as
    ``write_warc``.
  * ``read_cdxj``    — lines back to the index shape with native
    column expressions (no Python in the read path).

Indexed record types: ``response`` and ``revisit`` (the capture
records a lookup resolves to); ``warcinfo``/``request``/``metadata``
records are skipped, matching standard indexer defaults.

Determinism: the index derives entirely from WARC bytes, which are
themselves deterministic (uuid5 ids, round-clock dates — warc.py), so
identical crawls yield byte-identical .cdxj shards.
"""

from __future__ import annotations

import json
import os
import re
import zlib
from typing import Iterator
from urllib.parse import urlsplit

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeno_spark.operators.warc import (
    OPEN_SUFFIX,
    parse_http_block,
    parse_warc_stream,
)

CDXJ_ROWS = T.StructType(
    [
        T.StructField("surt", T.StringType(), False),
        T.StructField("ts", T.StringType(), False),  # 14-digit
        T.StructField("url", T.StringType(), False),
        T.StructField("record_type", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("filename", T.StringType(), False),
    ]
)

MANIFEST = T.StructType(
    [
        T.StructField("cdxj_file", T.StringType(), False),
        T.StructField("staged_file", T.StringType(), False),
        T.StructField("lines", T.LongType(), False),
        T.StructField("first_key", T.StringType(), True),
        T.StructField("last_key", T.StringType(), True),
    ]
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_IPV4_RE = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")


def _is_ascii(s: str) -> bool:
    try:
        s.encode("ascii")
        return True
    except UnicodeEncodeError:
        return False

# the public CDX convention (pywb/OpenWayback indexers): a revisit
# record is indexed with this mime so consumers of the on-disk .cdxj —
# which carries no WARC-Type — can still tell payload-carrying captures
# from digest-only revisits (the replay stitch needs exactly that)
MIME_REVISIT = "warc/revisit"


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform of ``url``.

    Implemented subset of the public SURT convention (the ordering
    contract CDX servers rely on, pinned against public edge-case
    vectors in tests/test_cdx.py::test_surt_conformance_vectors):
    lowercase throughout, scheme dropped, host labels reversed and
    comma-joined, userinfo dropped, trailing host dots stripped,
    IPv4-literal hosts kept in address order (the surt library's IP
    exemption — reversing octets would break range scans over an IP's
    captures), IPv6 literals kept verbatim, non-ASCII hosts
    IDNA-encoded (matching functions/urls.py's canonicalizer so a key
    computed from a RAW url agrees with one computed post-pipeline),
    default port dropped (explicit non-default ports kept as
    ``:port``), query parameters sorted bytewise, empty query/fragment
    dropped.  Not implemented (documented, DELIBERATE divergence from
    surt/pywb's aggressive IA canonicalizer): www-stripping and
    session-param removal — this repo's pipeline already canonicalizes
    URLs before they reach the fetched table (functions/urls.py), and
    the index key stays 1:1 with the stored URL; a pywb-indexed
    archive's ``com,example)/…`` key for ``www.example.com`` reads
    ``com,example,www)/…`` here.
    """
    parts = urlsplit(url.strip())
    host = (parts.hostname or "").lower().strip(".")
    if host and not _is_ascii(host):
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass  # unencodable label: key on the raw lowercased host
    if _IPV4_RE.match(host):
        key = host  # IP literals are not label-reversed
    else:
        key = ",".join(reversed(host.split("."))) if host else ""
    try:
        port = parts.port
    except ValueError:  # hostile netloc ('example.com:notaport')
        port = None
    if port is not None and str(port) != _DEFAULT_PORTS.get(parts.scheme, ""):
        key += f":{port}"
    path = parts.path or "/"
    out = f"{key}){path}"
    if parts.query:
        out += "?" + "&".join(sorted(parts.query.split("&")))
    return out.lower()


def _warc_ts(warc_date: str) -> str:
    """WARC-Date (ISO 8601 Zulu) -> 14-digit CDX timestamp."""
    digits = "".join(c for c in warc_date if c.isdigit())
    return (digits + "00000000000000")[:14]


def _gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, length, decompressed) per gzip member of a
    concatenated-member .warc.gz byte string.  memoryview keeps the
    per-member scan zero-copy (no O(n^2) tail slicing)."""
    mv = memoryview(data)
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(mv[pos:])
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        consumed = (n - pos) - len(d.unused_data)
        yield pos, consumed, raw
        pos += consumed


def _index_file_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    names = [f.name for f in CDXJ_ROWS.fields]
    for b in batches:
        idx = {n: i for i, n in enumerate(b.schema.names)}
        rows: list[dict] = []
        for i in range(b.num_rows):
            path = b.column(idx["path"])[i].as_py()
            content = b.column(idx["content"])[i].as_py()
            fname = path.split("/")[-1]
            for off, length, raw in _gzip_members(content):
                [rec] = list(parse_warc_stream(raw))
                rtype = rec["type"]
                if rtype not in ("response", "revisit"):
                    continue
                h = rec["headers"]
                url = h.get("WARC-Target-URI", "")
                status, mime = None, None
                if rec["block"]:
                    st, hh, _ = parse_http_block(rec["block"])
                    status = st
                    ct = hh.get("content-type")
                    mime = ct.split(";")[0].strip() if ct else None
                if rtype == "revisit":
                    mime = MIME_REVISIT
                digest = h.get("WARC-Payload-Digest") or None
                rows.append(
                    {
                        "surt": surt(url),
                        "ts": _warc_ts(h.get("WARC-Date", "")),
                        "url": url,
                        "record_type": rtype,
                        "status": status,
                        "mime": mime,
                        "digest": digest,
                        "offset": off,
                        "length": length,
                        "filename": fname,
                    }
                )
        arrays = [
            pa.array(
                [r[f.name] for r in rows],
                type={"string": pa.string(), "int": pa.int32(),
                      "bigint": pa.int64()}[f.dataType.simpleString()],
            )
            for f in CDXJ_ROWS.fields
        ]
        yield pa.RecordBatch.from_arrays(arrays, names=names)


def cdxj_index(spark: SparkSession, warc_dir: str) -> DataFrame:
    """Index every ``*.warc.gz`` under ``warc_dir`` into CDXJ_ROWS.
    One task per file (WARC members don't split — the same layout rule
    read_warc follows); only headers are parsed, payload bytes never
    leave the worker."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(warc_dir)
        .select("path", "content")
    )
    return files.mapInArrow(_index_file_batches, schema=CDXJ_ROWS)


def _cdxj_line_col():
    """The CDXJ line as a native column expression: SURT key, space,
    timestamp, space, JSON block (to_json drops null fields, matching
    indexer output; key order is the struct's fixed field order)."""
    block = F.to_json(
        F.struct(
            F.col("url"),
            F.col("digest"),
            F.col("mime"),
            F.col("status").cast("string").alias("status"),
            F.col("offset").cast("string").alias("offset"),
            F.col("length").cast("string").alias("length"),
            F.col("filename"),
        )
    )
    return F.concat_ws(" ", F.col("surt"), F.col("ts"), block)


def _write_shard_batches(out_dir: str, prefix: str):
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        tid = ctx.taskAttemptId() if ctx else 0
        final = os.path.join(out_dir, f"{prefix}-{pid:05d}.cdxj")
        # attempt-unique staging name: two attempts of one partition
        # never write the same path (write_warc's commit discipline)
        staged = f"{final}{OPEN_SUFFIX}-{tid}"
        lines = 0
        first_key = last_key = None
        os.makedirs(out_dir, exist_ok=True)
        with open(staged, "w", encoding="utf-8") as fh:
            for b in batches:
                col = b.column(b.schema.names.index("line"))
                for v in col:
                    line = v.as_py()
                    key = line.split(" {", 1)[0]
                    if first_key is None:
                        first_key = key
                    last_key = key
                    fh.write(line)
                    fh.write("\n")
                    lines += 1
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([final], type=pa.string()),
                pa.array([staged], type=pa.string()),
                pa.array([lines], type=pa.int64()),
                pa.array([first_key], type=pa.string()),
                pa.array([last_key], type=pa.string()),
            ],
            names=[f.name for f in MANIFEST.fields],
        )
    return gen


def write_cdxj(
    index: DataFrame, out_dir: str, shards: int = 1, prefix: str = "index"
) -> DataFrame:
    """Write ``index`` (CDXJ_ROWS shape) as globally sorted ``.cdxj``
    shards: ``repartitionByRange(shards, surt, ts)`` makes shard file
    order the key order, ``sortWithinPartitions`` orders lines inside
    each — so the concatenation in filename order is one sorted index
    and a lookup server binary-searches shard boundaries then lines.
    Empty-partition shards are skipped (range partitioning may produce
    fewer populated shards than requested).  Same two-phase job commit
    as write_warc: workers stage ``.open-<attempt>`` files, the driver
    publishes only winning attempts and sweeps losers.  ``out_dir``
    must be driver+executor shared (the FileOutputCommitter
    requirement).  Returns the shard manifest."""
    lines = (
        index.repartitionByRange(max(1, shards), "surt", "ts")
        .sortWithinPartitions("surt", "ts")
        .select(_cdxj_line_col().alias("line"))
    )
    manifest = [
        r for r in lines.mapInArrow(
            _write_shard_batches(out_dir, prefix), schema=MANIFEST
        ).collect()
        if r.lines > 0
    ]
    missing = [r.staged_file for r in manifest
               if not os.path.exists(r.staged_file)]
    if missing:
        raise RuntimeError(
            "write_cdxj job commit: staged files not visible to the "
            f"driver (out_dir must be a shared filesystem): {missing[:3]}"
        )
    for r in manifest:  # publish winners
        os.replace(r.staged_file, r.cdxj_file)
    if os.path.isdir(out_dir):  # sweep dead attempts' stages
        for fname in os.listdir(out_dir):
            if fname.startswith(prefix + "-") and OPEN_SUFFIX in fname:
                os.remove(os.path.join(out_dir, fname))
    spark = index.sparkSession
    return spark.createDataFrame(manifest, MANIFEST)


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``.cdxj`` lines back to the index shape (CDXJ_ROWS minus
    ``record_type``, which is not carried on the line — standard CDXJ
    blocks hold capture fields only) with native column expressions
    (text source -> split -> from_json; no Python in the read path)."""
    block_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("digest", T.StringType()),
            T.StructField("mime", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("offset", T.StringType()),
            T.StructField("length", T.StringType()),
            T.StructField("filename", T.StringType()),
        ]
    )
    lines = spark.read.text(os.path.join(path, "*.cdxj"))
    j = F.from_json(
        F.expr("substring(value, instr(value, ' {') + 1)"), block_schema
    )
    return (
        lines.select(
            F.split(F.col("value"), " ").getItem(0).alias("surt"),
            F.split(F.col("value"), " ").getItem(1).alias("ts"),
            j.alias("j"),
        )
        .select(
            "surt", "ts",
            F.col("j.url").alias("url"),
            F.col("j.status").cast("int").alias("status"),
            F.col("j.mime").alias("mime"),
            F.col("j.digest").alias("digest"),
            F.col("j.offset").cast("long").alias("offset"),
            F.col("j.length").cast("long").alias("length"),
            F.col("j.filename").alias("filename"),
        )
    )


def is_revisit_col(index: DataFrame) -> F.Column:
    """Revisit detection across both index shapes: the in-memory
    ``cdxj_index`` frame carries ``record_type``; the on-disk CDXJ line
    does not, so ``read_cdxj`` consumers rely on the public
    ``warc/revisit`` mime convention instead.  NULL-SAFE and
    missing-column-safe: a capture with a null mime (a foreign WARC
    whose response carried no Content-Type) or an index with neither
    column classifies as payload-carrying — a three-valued NULL here
    would silently drop the capture from a NOT-filtered originals scan.
    The one shared classifier for the dedupe (fetch.mark_cdx_revisits)
    and replay (resolve_captures) tiers, so they can never disagree on
    the same index row."""
    if "record_type" in index.columns:
        return F.coalesce(F.col("record_type") == "revisit", F.lit(False))
    if "mime" in index.columns:
        return F.coalesce(F.col("mime") == MIME_REVISIT, F.lit(False))
    return F.lit(False)


def resolve_captures(index: DataFrame, wanted: DataFrame) -> DataFrame:
    """Wayback-style capture resolution (the lookup a replay/CDX server
    performs per request): for each url in ``wanted`` (a single bounded
    ``url`` column — e.g. one crawl round's scheduled batch), pick the
    LATEST capture in ``index`` (CDXJ shape from ``cdxj_index`` or
    ``read_cdxj``; ties broken by (ts, filename, offset) so resolution
    is deterministic), and when that capture is a revisit record —
    which archives only a digest, never payload bytes — stitch in the
    byte extent of the EARLIEST payload-carrying capture sharing its
    digest (the record the revisit's WARC-Refers-To names).

    One row per RESOLVABLE url:

      url, ts, status,
      hdr_filename/hdr_offset/hdr_length  — the capture to serve
                                            status + headers from
      pay_filename/pay_offset/pay_length  — the record holding the
                                            payload block (== hdr_* for
                                            plain responses)

    A url with no capture, and a revisit whose original is absent from
    the index, resolves to NO row — "not archived" (the transport's
    covers_all=False turns that into the native-404 path).

    Scale shape: the archive index may hold 10^10 captures while
    ``wanted`` is bounded by the round, so the index scan is semi-join
    pruned by the broadcast wanted set BEFORE any aggregation — the
    archive side is never shuffled; both groupBys and the final joins
    run over <= |wanted| rows, and only (url, ts, digest, extent)
    columns are ever read from the index."""
    is_rev = is_revisit_col(index)
    order = F.struct("ts", "filename", "offset")
    urls = wanted.select("url").distinct()
    best = (
        index.join(F.broadcast(urls), "url", "left_semi")
        .groupBy("url")
        .agg(
            F.max_by(
                F.struct("ts", "status", "digest", "filename", "offset",
                         "length", is_rev.alias("is_rev")),
                order,
            ).alias("c")
        )
        .select("url", "c.*")
    )
    rev_digests = (
        best.filter(F.col("is_rev") & F.col("digest").isNotNull())
        .select("digest").distinct()
    )
    originals = (
        index.filter(~is_rev & F.col("digest").isNotNull())
        .join(F.broadcast(rev_digests), "digest", "left_semi")
        .groupBy("digest")
        .agg(F.min_by(F.struct("filename", "offset", "length"), order)
             .alias("o"))
    )
    pay = lambda c: (  # noqa: E731
        F.when(F.col("is_rev"), F.col(f"o.{c}")).otherwise(F.col(c))
    )
    return (
        best.join(F.broadcast(originals), "digest", "left")
        .select(
            "url", "ts", "status",
            F.col("filename").alias("hdr_filename"),
            F.col("offset").alias("hdr_offset"),
            F.col("length").alias("hdr_length"),
            pay("filename").alias("pay_filename"),
            pay("offset").alias("pay_offset"),
            pay("length").alias("pay_length"),
        )
        .filter(F.col("pay_filename").isNotNull())
    )
