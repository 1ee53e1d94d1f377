"""WARC container emission + ingestion (S6 parity, SURVEY §2.1).

The reference records all HTTP traffic into rotating gzip WARC files via
its WARC-writing client (crawl/crawl.go:101-119; rotation settings
crawl/warc.go:11-26; 1 GB default rotation cmd/get.go:80-82).  Round 1/2
replaced WARC with the `fetched` Iceberg table; this module closes the
container-format gap so a user migrating off the reference keeps their
tooling:

  * ``write_warc``  — export fetched-table rows to standards-shaped
    ``.warc.gz`` files (one gzip member per record, the concatenated-
    member layout every WARC reader expects), distributed: one file per
    Spark partition, written inside a ``mapInArrow`` worker so payload
    bytes go parquet scan -> gzip stream without ever shuffling or
    crossing into pandas.  Returns a manifest DataFrame (file, records,
    bytes) — the driver action is the manifest collect, never the data.
  * ``read_warc``   — load ``.warc.gz`` files back into the fetched-row
    shape via the ``binaryFile`` source + an Arrow parser, so a WARC
    corpus (ours or the reference's) can seed the datapipe tier.
  * Pure-stdlib record framing (`build_record` / `parse_warc_stream`)
    usable outside Spark; no external warc library.

Record mapping (ISO 28500 / WARC 1.1, public spec):

  fetched row, revisit=false -> WARC-Type: response, block = synthesized
      HTTP/1.1 response (status line + headers + payload); the image
      metadata columns ride as ``X-Zeno-*`` response headers so the
      round-trip restores the input_hint row exactly.
  fetched row, revisit=true  -> WARC-Type: revisit with
      WARC-Profile: .../revisit/identical-payload-digest and no payload
      block, mirroring the reference's payload-dedupe revisit records
      (crawl/crawl.go:96-99).
  per wire event             -> a paired WARC-Type: request record
      carrying the synthesized (batch) or actually-sent (live) GET,
      linked to its response via WARC-Concurrent-To — the reference's
      recording client captures BOTH sides of every exchange
      (crawl/crawl.go:101-119), and CDX/replay tooling expects the
      pairs.
  per file                   -> a leading warcinfo record.

Determinism: record ids are uuid5 of (url, round, digest) and
WARC-Date derives from the round clock (streaming/live.py ROUND_SECONDS
discipline), so identical inputs emit byte-identical files — the same
reproducibility contract as every other sink in this repo.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import re
import uuid
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_SOFTWARE = "zeno-spark/0.2 (PySpark frontier crawler)"
_REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"
# fixed epoch for the round clock -> deterministic WARC-Date
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
_ROUND_SECONDS = 60
# uuid5 namespace for record ids (any fixed namespace works; DNS is fine)
_NS = uuid.NAMESPACE_URL

# metadata columns that ride as synthesized HTTP response headers
_X_HEADERS = ("image_id", "w", "h", "fmt", "caption", "phash")

MANIFEST = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("records", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

WARC_ROWS = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("record_type", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("payload_digest", T.StringType(), True),
        T.StructField("revisit", T.BooleanType(), False),
        T.StructField("refers_to_url", T.StringType(), True),
        T.StructField("refers_to_date", T.StringType(), True),
        T.StructField("round", T.IntegerType(), True),
        T.StructField("warc_file", T.StringType(), False),
    ]
)


# ---------------------------------------------------------------------------
# framing (pure stdlib)
# ---------------------------------------------------------------------------

def _warc_date(round_no: int) -> str:
    t = _EPOCH + timedelta(seconds=_ROUND_SECONDS * max(round_no, 0))
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_id(*parts) -> str:
    return f"<urn:uuid:{uuid.uuid5(_NS, '|'.join(str(p) for p in parts))}>"


def build_record(
    record_type: str,
    headers: dict[str, str],
    block: bytes,
) -> bytes:
    """One WARC 1.1 record: version line, named fields, Content-Length,
    block, two CRLFs.  Caller supplies type-specific fields; block
    digest is computed here."""
    h = dict(headers)
    h["WARC-Type"] = record_type
    h["Content-Length"] = str(len(block))
    if block:
        h["WARC-Block-Digest"] = (
            "sha256:" + hashlib.sha256(block).hexdigest()
        )
    out = io.BytesIO()
    out.write(b"WARC/1.1" + _CRLF)
    for k, v in h.items():
        out.write(f"{k}: {v}".encode("utf-8") + _CRLF)
    out.write(_CRLF)
    out.write(block)
    out.write(_CRLF + _CRLF)
    return out.getvalue()


def warcinfo_record(filename: str, round_no: int) -> bytes:
    body = (
        f"software: {_SOFTWARE}\r\n"
        "format: WARC File Format 1.1\r\n"
    ).encode("utf-8")
    return build_record(
        "warcinfo",
        {
            "WARC-Record-ID": _record_id("warcinfo", filename),
            "WARC-Date": _warc_date(round_no),
            "WARC-Filename": filename,
            "Content-Type": "application/warc-fields",
        },
        body,
    )


def _safe_header_value(v: str) -> str:
    """A header value must never carry CR/LF: an embedded newline would
    corrupt the inner HTTP framing (parse_http_block would read wrong
    headers/body for the record).  Values built by encode_header_value
    are already clean; anything else gets the characters replaced — a
    framing safety net, not a round-trip path."""
    return v.replace("\r", " ").replace("\n", " ")


def encode_header_value(v: str) -> str:
    """Lossless header-value transport for the X-Zeno-* metadata
    columns: percent-encode %, CR, LF — and a leading/trailing
    whitespace char, because every conformant receiver (RFC 7230 OWS,
    parse_http_block's strip) eats whitespace around field values, so
    a caption like ' hi ' would otherwise ingest back as 'hi'
    (hypothesis-found; the north rule requires caption byte-equality).
    All raw % are escaped first, so decode is one full unquote pass."""
    from urllib.parse import quote

    v = v.replace("%", "%25").replace("\r", "%0D").replace("\n", "%0A")
    if v and v[0].isspace():
        v = quote(v[0], safe="") + v[1:]
    if v and v[-1].isspace():
        v = v[:-1] + quote(v[-1], safe="")
    return v


def decode_header_value(v: str) -> str:
    from urllib.parse import unquote

    # single-pass percent-decode: the encoder escaped every literal %,
    # so each %XX here is the encoder's own (incl. the legacy
    # %0A/%0D/%25 triple, which decodes identically)
    return unquote(v)


def http_block(
    status: int,
    content_type: str,
    payload: bytes,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """Synthesize the HTTP/1.1 response the reference's client would
    have recorded (we fetch from a table / Arrow worker, so the wire
    bytes are reconstructed, not replayed)."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              422: "Unprocessable Entity", 429: "Too Many Requests"}.get(
        status, "Status")
    lines = [f"HTTP/1.1 {status} {reason}"]
    lines.append(f"Content-Type: {_safe_header_value(content_type)}")
    lines.append(f"Content-Length: {len(payload)}")
    for k, v in (extra_headers or {}).items():
        lines.append(f"{_safe_header_value(k)}: {_safe_header_value(v)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")
    return head + payload


def http_request_block(url: str, headers: dict[str, str] | None) -> bytes:
    """Synthesize the HTTP/1.1 GET the transport sent (batch export) or
    frame the one it actually sent (live capture — the caller passes the
    real UA/Referer from transport.py's request object)."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    lines = [f"GET {_safe_header_value(path)} HTTP/1.1",
             f"Host: {_safe_header_value(parts.netloc)}"]
    for k, v in (headers or {}).items():
        lines.append(f"{_safe_header_value(k)}: {_safe_header_value(v)}")
    return ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")


def request_record(
    url: str,
    round_no: int,
    req_headers: dict[str, str] | None = None,
    concurrent_to: str | None = None,
    record_id: str | None = None,
    warc_date: str | None = None,
    digest_key: str | None = None,
) -> bytes:
    """WARC-Type: request paired to its response via WARC-Concurrent-To
    (crawl/crawl.go:101-119 — the recording client captures request and
    response sides of every exchange).  ``digest_key`` folds the
    response's payload digest into the deterministic batch record id so
    a URL re-fetched across rounds keeps id uniqueness, same derivation
    as the response side."""
    block = http_request_block(url, req_headers)
    h = {
        "WARC-Record-ID": record_id
        or _record_id("request", url, round_no, digest_key),
        "WARC-Date": warc_date or _warc_date(round_no),
        "WARC-Target-URI": url,
        "Content-Type": 'application/http;msgtype=request',
    }
    if concurrent_to:
        h["WARC-Concurrent-To"] = concurrent_to
    return build_record("request", h, block)


def response_record(
    url: str,
    round_no: int,
    status: int,
    content_type: str,
    payload: bytes,
    payload_digest: str | None,
    extra_headers: dict[str, str] | None = None,
    record_id: str | None = None,
    warc_date: str | None = None,
) -> bytes:
    """``record_id``/``warc_date`` overrides exist for the LIVE capture
    path: there, repeat fetches of the same URL (429 retries across
    rounds, refreshed captures) are distinct wire events, so the writer
    supplies per-attempt-unique ids and real wall-clock dates instead of
    the deterministic (url, round, digest) derivation the batch sink
    uses (WARC 1.1 requires record-id uniqueness per record)."""
    block = http_block(status, content_type, payload, extra_headers)
    h = {
        "WARC-Record-ID": record_id
        or _record_id("response", url, round_no, payload_digest),
        "WARC-Date": warc_date or _warc_date(round_no),
        "WARC-Target-URI": url,
        "Content-Type": 'application/http;msgtype=response',
    }
    if payload_digest:
        h["WARC-Payload-Digest"] = f"sha256:{payload_digest}"
    return build_record("response", h, block)


def revisit_record(
    url: str,
    round_no: int,
    status: int,
    content_type: str,
    payload_digest: str | None,
    extra_headers: dict[str, str] | None = None,
    refers_to_url: str | None = None,
    refers_to_date: str | None = None,
) -> bytes:
    """Identical-payload-digest revisit: headers-only block, no payload
    (crawl/crawl.go:96-99 discipline).  A CDX-deduped revisit (remote
    tier, crawl/crawl.go:97-98) names the prior archive's original
    capture via WARC-Refers-To-Target-URI / WARC-Refers-To-Date."""
    block = http_block(status, content_type, b"", extra_headers)
    h = {
        "WARC-Record-ID": _record_id("revisit", url, round_no, payload_digest),
        "WARC-Date": _warc_date(round_no),
        "WARC-Target-URI": url,
        "WARC-Profile": _REVISIT_PROFILE,
        "Content-Type": 'application/http;msgtype=response',
    }
    if refers_to_url:
        h["WARC-Refers-To-Target-URI"] = encode_header_value(refers_to_url)
    if refers_to_date:
        h["WARC-Refers-To-Date"] = encode_header_value(refers_to_date)
    if payload_digest:
        h["WARC-Payload-Digest"] = f"sha256:{payload_digest}"
    return build_record("revisit", h, block)


OPEN_SUFFIX = ".open"


class WarcWriter:
    """Rotating .warc.gz writer: one gzip member per record (standard
    concatenated-member layout), rotate at ``rotate_bytes`` of
    compressed output (crawl/warc.go:11-26's 1 GB default, scaled down
    by callers for tests).

    Commit protocol: every file streams into ``<name>.warc.gz.open``
    and NOTHING is renamed before the writer's lifetime ends — rotation
    only switches streams, so a task attempt that dies at ANY point
    (executor OOM, speculative kill, even after several rotations)
    leaves only ``.open`` orphans, which ``read_warc``'s ``*.warc.gz``
    glob never matches.  ``publish()`` renames the whole series to its
    final names; ``close(publish=True)`` (the live-capture default)
    does it at stream end, while the batch export (``write_warc``)
    defers it to a driver-side job commit over the winning attempts'
    manifests, so a retried attempt can never double-publish records
    that a dead attempt's early files already carried."""

    def __init__(self, out_dir: str, prefix: str, round_no: int,
                 rotate_bytes: int = 1 << 30):
        self.out_dir = out_dir
        self.prefix = prefix
        self.round_no = round_no
        self.rotate_bytes = rotate_bytes
        self.seq = -1
        self.fh = None
        self.files: list[str] = []
        self.file_records: list[int] = []
        self.file_bytes: list[int] = []
        os.makedirs(out_dir, exist_ok=True)

    def _roll(self) -> None:
        if self.fh is not None:
            self.fh.close()
            self.fh = None
        self.seq += 1
        name = f"{self.prefix}-{self.seq:05d}.warc.gz"
        path = os.path.join(self.out_dir, name)
        self.fh = open(path + OPEN_SUFFIX, "wb")
        self.files.append(path)
        self.file_records.append(0)
        self.file_bytes.append(0)
        self._member(warcinfo_record(name, self.round_no))

    def publish(self) -> None:
        """Rename the completed series to its final ``.warc.gz`` names
        (idempotent: files already published are left alone)."""
        for path in self.files:
            if os.path.exists(path + OPEN_SUFFIX):
                os.rename(path + OPEN_SUFFIX, path)

    def _member(self, record: bytes) -> None:
        # mtime=0 + fixed filename keep the gzip member deterministic
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(record)
        data = buf.getvalue()
        self.fh.write(data)
        self.file_bytes[-1] += len(data)
        self.file_records[-1] += 1

    def add(self, record: bytes) -> None:
        if self.fh is None or self.fh.tell() >= self.rotate_bytes:
            self._roll()
        self._member(record)

    def close(self, publish: bool = True) -> None:
        if self.fh is not None:
            self.fh.close()
            self.fh = None
        if publish:
            self.publish()


# ---------------------------------------------------------------------------
# parsing (pure stdlib)
# ---------------------------------------------------------------------------

def parse_warc_stream(data: bytes) -> Iterator[dict]:
    """Iterate records of a .warc.gz byte string (or uncompressed WARC).
    Yields dicts: {type, headers, block}."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.index(b"\r\n\r\n", pos)
        head = data[pos:head_end].decode("utf-8")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad record header at {pos}: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        clen = int(headers["Content-Length"])
        block = data[head_end + 4:head_end + 4 + clen]
        yield {
            "type": headers.get("WARC-Type", ""),
            "headers": headers,
            "block": block,
        }
        pos = head_end + 4 + clen


def parse_http_block(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) of a synthesized/recorded HTTP response."""
    head_end = block.index(b"\r\n\r\n")
    head = block[:head_end].decode("utf-8", "replace")
    lines = head.split("\r\n")
    status = int(lines[0].split(" ", 2)[1])
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[head_end + 4:]


# ---------------------------------------------------------------------------
# Spark sink / source
# ---------------------------------------------------------------------------

_SINK_COLS = ["url", "status", "image_id", "bytes", "w", "h", "fmt",
              "caption", "phash", "round", "payload_digest", "revisit",
              "refers_to_url", "refers_to_date"]


def _write_batches(out_dir: str, rotate_bytes: int,
                   request_headers: dict[str, str] | None):
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        # task ATTEMPT id, not partition id: a retried or speculative
        # attempt of the same partition must write its own file series —
        # two attempts interleaving one zeno-*.warc.gz path would corrupt
        # the gzip stream while only one attempt's manifest returns
        # (same discipline as the live capture path, transport.py)
        ctx = TaskContext.get()
        tid = ctx.taskAttemptId() if ctx else 0
        writer = WarcWriter(out_dir, f"zeno-{tid:08d}", 0,
                            rotate_bytes=rotate_bytes)
        for b in batches:
            idx = {n: i for i, n in enumerate(b.schema.names)}

            def val(name, i):
                v = b.column(idx[name])[i]
                return v.as_py() if v.is_valid else None

            for i in range(b.num_rows):
                url = val("url", i)
                status = val("status", i) or 0
                fmt = val("fmt", i)
                round_no = val("round", i) or 0
                writer.round_no = round_no
                ct = f"image/{fmt}" if fmt else "text/html"
                xh = {}
                for c in _X_HEADERS:
                    v = val(c, i)
                    if v is not None:
                        xh[f"X-Zeno-{c.replace('_', '-').title()}"] = (
                            encode_header_value(str(v))
                        )
                digest = val("payload_digest", i)
                revisit = val("revisit", i)
                if revisit:
                    rec = revisit_record(
                        url, round_no, status, ct, digest, xh,
                        refers_to_url=val("refers_to_url", i),
                        refers_to_date=val("refers_to_date", i),
                    )
                else:
                    payload = val("bytes", i) or b""
                    rec = response_record(
                        url, round_no, status, ct, payload, digest, xh)
                if request_headers is not None:
                    # paired request record FIRST (reader convention),
                    # linked by WARC-Concurrent-To to the response id —
                    # which must be derived exactly as the response/
                    # revisit constructor derives it
                    resp_id = _record_id(
                        "revisit" if revisit else "response",
                        url, round_no, digest,
                    )
                    writer.add(request_record(
                        url, round_no, request_headers,
                        concurrent_to=resp_id, digest_key=digest,
                    ))
                writer.add(rec)
        # no worker-side publish: the driver's job commit (write_warc)
        # renames only the WINNING attempts' files — a dead attempt's
        # whole series, including files completed before it died, stays
        # .open and is swept
        writer.close(publish=False)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(writer.files, type=pa.string()),
                pa.array(writer.file_records, type=pa.int64()),
                pa.array(writer.file_bytes, type=pa.int64()),
            ],
            names=["warc_file", "records", "bytes"],
        )
    return gen


def _is_own_stage_loser(fname: str) -> bool:
    """True iff ``fname`` is a staging (.open) file of THIS archive
    export's ``zeno-<8 digit tid>-`` series.  Deliberately does NOT
    match the derived sinks' ``zeno-wet-*``/``zeno-wat-*`` staging
    series (wetwat.py:_job_commit sweeps those, prefix-scoped) so
    concurrent exports can share a directory without the loser sweep
    deleting each other's in-flight files."""
    return (re.match(r"zeno-\d{8}-", fname) is not None
            and fname.endswith(".warc.gz" + OPEN_SUFFIX))


def write_warc(
    fetched: DataFrame, out_dir: str, rotate_bytes: int = 1 << 30,
    include_requests: bool = True,
    request_headers: dict[str, str] | None = None,
) -> DataFrame:
    """Export fetched-table rows to .warc.gz, one file-series per
    partition (distributed, no shuffle: the payload column flows
    parquet scan -> worker -> gzip stream).  Each row emits a paired
    ``request`` + ``response``/``revisit`` record (WARC-Concurrent-To
    linked) unless ``include_requests=False``; ``request_headers``
    defaults to this crawler's User-Agent — pass the configured UA for
    byte-faithful reconstruction.  Runs EAGERLY as a
    two-phase job commit (FileOutputCommitter discipline): workers
    stream every file under a ``.open`` staging name; the driver then
    renames exactly the files named by the winning attempts' manifests
    and sweeps every remaining ``.open`` — so neither a task retry nor
    speculative execution can publish a loser's records, even files it
    completed before dying.  Returns the manifest DataFrame (already
    materialized; collecting it is free).

    ``out_dir`` must be a filesystem the driver and every executor
    share (NFS / fuse-mounted object store — the same requirement
    Hadoop's FileOutputCommitter has for its job commit, and which
    ``read_warc`` needs anyway).  A manifest file whose staging name is
    missing at commit time raises rather than silently stranding the
    corpus (the symptom of a non-shared out_dir).  The loser sweep
    touches only this export's ``zeno-<8 digit tid>-`` staging series,
    never another writer's (a live capture's ``live-*`` series or a
    derived WET/WAT export's ``zeno-wet-*``/``zeno-wat-*`` series
    sharing the directory).

    Completed ``.warc.gz`` files from an earlier run into the same
    directory are NOT touched, so re-running the export into a
    non-empty directory appends a second copy of the corpus — point
    the export at a fresh directory per run."""
    types = {f.name: f.dataType.simpleString() for f in WARC_ROWS.fields}
    cols = [
        (F.col(c) if c in fetched.columns
         else F.lit(None).cast(types.get(c, "string"))).alias(c)
        for c in _SINK_COLS
    ]
    narrowed = fetched.select(*cols)
    req_headers = (
        ({"User-Agent": _SOFTWARE} if request_headers is None
         else dict(request_headers))
        if include_requests else None
    )
    manifest = narrowed.mapInArrow(
        _write_batches(out_dir, rotate_bytes, req_headers), schema=MANIFEST
    ).collect()
    missing = [
        r.warc_file for r in manifest
        if not os.path.exists(r.warc_file + OPEN_SUFFIX)
        and not os.path.exists(r.warc_file)
    ]
    if missing:
        raise RuntimeError(
            "write_warc job commit: staged files not visible to the "
            f"driver (out_dir must be a driver+executor shared "
            f"filesystem): {missing[:3]}"
        )
    for r in manifest:  # job commit: publish winners only
        if os.path.exists(r.warc_file + OPEN_SUFFIX):
            os.rename(r.warc_file + OPEN_SUFFIX, r.warc_file)
    if os.path.isdir(out_dir):  # sweep this export's losers (and prior
        for fname in os.listdir(out_dir):  # crashed runs of it)
            if _is_own_stage_loser(fname):
                os.remove(os.path.join(out_dir, fname))
    return fetched.sparkSession.createDataFrame(manifest, MANIFEST)


def _parse_file_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    names = [f.name for f in WARC_ROWS.fields]
    for b in batches:
        idx = {n: i for i, n in enumerate(b.schema.names)}
        rows: list[dict] = []
        for i in range(b.num_rows):
            path = b.column(idx["path"])[i].as_py()
            content = b.column(idx["content"])[i].as_py()
            fname = path.split("/")[-1]
            for rec in parse_warc_stream(content):
                rtype = rec["type"]
                # request records pair with their response for replay
                # tooling; the fetched-row shape is response-side only
                if rtype in ("warcinfo", "request"):
                    continue
                status, hh, body = parse_http_block(rec["block"])
                digest = rec["headers"].get("WARC-Payload-Digest", "")
                def xz(key):
                    v = hh.get(key)
                    return decode_header_value(v) if v is not None else None

                row = {
                    "url": rec["headers"].get("WARC-Target-URI"),
                    "record_type": rtype,
                    "status": status,
                    "image_id": xz("x-zeno-image-id"),
                    "bytes": body if (rtype == "response" and body) else None,
                    "w": int(hh["x-zeno-w"]) if "x-zeno-w" in hh else None,
                    "h": int(hh["x-zeno-h"]) if "x-zeno-h" in hh else None,
                    "fmt": xz("x-zeno-fmt"),
                    "caption": xz("x-zeno-caption"),
                    "phash": int(hh["x-zeno-phash"]) if "x-zeno-phash" in hh else None,
                    "payload_digest": digest.removeprefix("sha256:") or None,
                    "revisit": rtype == "revisit",
                    "refers_to_url": (
                        decode_header_value(rec["headers"][
                            "WARC-Refers-To-Target-URI"])
                        if "WARC-Refers-To-Target-URI" in rec["headers"]
                        else None
                    ),
                    "refers_to_date": (
                        decode_header_value(rec["headers"][
                            "WARC-Refers-To-Date"])
                        if "WARC-Refers-To-Date" in rec["headers"]
                        else None
                    ),
                    "round": None,
                    "warc_file": fname,
                }
                rows.append(row)
        arrays = [
            pa.array([r[f.name] for r in rows], type=_pa_type(f.dataType))
            for f in WARC_ROWS.fields
        ]
        yield pa.RecordBatch.from_arrays(arrays, names=names)


def _pa_type(dt: T.DataType):
    return {
        "string": pa.string(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "binary": pa.binary(),
        "boolean": pa.bool_(),
    }[dt.simpleString()]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Load .warc.gz files into the fetched-row shape.  Uses the
    binaryFile source (one task per file — WARC members don't split,
    same as every WARC processing stack) + an Arrow parser."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("path", "content")
    )
    return files.mapInArrow(_parse_file_batches, schema=WARC_ROWS)
