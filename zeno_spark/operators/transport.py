"""Fetch transports — the seam between the crawl plan and the wire.

The reference talks HTTP through one WARC-recording client object
(crawl/crawl.go:101-119) that every capture goes through
(capture.go:30-181); swapping that client is how its tests and proxies
work.  This module gives the Spark plan the same seam: ``fetch_meta``
consumes a *transport*, and the two implementations keep the SAME
output shape so everything downstream (status semantics, digest, the
Arrow verify worker, D8, extract) is byte-identical between them:

  * ``OriginTableTransport`` — the sandbox/bench origin: the scheduled
    batch broadcast-probes the deterministic ``pages`` table (an
    equi-join IS this environment's HTTP GET).  Default everywhere.
  * ``HttpTransport`` — real sockets: an ``mapInArrow`` worker performs
    the GETs for its batch (UA + Referer from the parent row like
    capture.go:206-210, bounded retries on connection errors like
    capture.go:56-83, no implicit redirect following — 3xx surfaces as
    a redirect row exactly like capture.go:120-178), honouring the X4
    proxy/bypass routing (capture.go:60-64), and optionally recording
    every response into rotating .warc.gz files AS IT STREAMS
    (operators/warc.py) — the WARC-recording-client behaviour, which
    is also what keeps payload bytes out of the measured plan in a
    live deployment.

Transport contract: ``responses(scheduled, cfg)`` returns a DataFrame
with the scheduled columns plus (__page_status int, __bytes binary,
__adv_phash string, image_id, w, h, fmt, caption, phash, content_type,
redirect_to).  ``covers_all`` tells fetch_meta whether every scheduled
row yields a response row (HTTP: yes — connection failure is a status;
origin table: no — absent rows become native 404s).
``deterministic_429`` opts into the sandbox's "server recovered on
retry" rewrite; a live transport reports what the server actually said.

Scale shape: one worker task per frontier partition (the politeness
schedule already bounds rows/host/round), requests sequential within a
batch — per-host serialization for free, since a host's rows share a
partition.  No shuffle is introduced: scheduled -> mapInArrow is a
narrow chain.
"""

from __future__ import annotations

import time
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeno_spark import schemas

_META_FIELDS = [
    T.StructField("image_id", T.StringType(), True),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), True),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("caption", T.StringType(), True),
    T.StructField("phash", T.LongType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("redirect_to", T.StringType(), True),
]

# transport output: scheduled columns + raw response columns.
# __outlinks/__assets are the in-worker extraction results (P1-P12 run
# against the live body while it's in hand — the reference parses inside
# the capture worker too, capture.go:459-501); null when the transport
# doesn't extract (the origin-table path reads the links table instead).
RESPONSES = T.StructType(
    schemas.FRONTIER.fields
    + _META_FIELDS
    + [
        T.StructField("__page_status", T.IntegerType(), True),
        T.StructField("__bytes", T.BinaryType(), True),
        T.StructField("__adv_phash", T.StringType(), True),
        T.StructField("__outlinks", T.ArrayType(T.StringType()), True),
        T.StructField("__assets", T.ArrayType(T.StringType()), True),
        # 429 Retry-After header parsed to seconds (live transport only)
        T.StructField("__retry_after", T.DoubleType(), True),
    ]
)

_CARRY = [f.name for f in schemas.FRONTIER.fields]
_META_COLS = [f.name for f in _META_FIELDS]
_USER_AGENT = "zeno-spark/0.2 (+https://example.invalid/crawler)"


class OriginTableTransport:
    """The pages-table origin (sandbox / bench / unit tests): broadcast
    the scheduled batch onto the column-pruned origin scan.  Payload
    bytes stream straight out of parquet; nothing touches Python here."""

    covers_all = False
    deterministic_429 = True

    def __init__(self, pages: DataFrame):
        self.pages = pages

    def responses(self, scheduled: DataFrame, cfg=None) -> DataFrame:
        page_side = self.pages.select(
            F.col("url").alias("__page_url"),
            F.col("status").alias("__page_status"),
            F.col("bytes").alias("__bytes"),
            # string sidecar: int64 > 2^53 survives Arrow exactly
            F.col("phash").cast("string").alias("__adv_phash"),
            *_META_COLS,
        )
        sched_b = F.broadcast(scheduled)
        return (
            page_side.join(
                sched_b, page_side["__page_url"] == sched_b["url"], "inner"
            )
            .drop("__page_url")
            .withColumn("__outlinks", F.lit(None).cast("array<string>"))
            .withColumn("__assets", F.lit(None).cast("array<string>"))
            .withColumn("__retry_after", F.lit(None).cast("double"))
        )


def retry_after_seconds(v, _now=None):
    """Parse a 429's Retry-After header value to seconds (RFC 9110
    §10.2.3: delta-seconds or an HTTP-date).  Hostile/malformed values
    parse to None rather than crash the fetch task; negative results
    clamp to 0 (the date already passed)."""
    if not v:
        return None
    try:
        return max(0.0, float(int(v.strip())))
    except (ValueError, TypeError, AttributeError):
        pass
    try:
        from datetime import datetime, timezone
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(v)
        now = _now or datetime.now(timezone.utc)
        return max(0.0, (dt - now).total_seconds())
    except Exception:
        return None


STATUS_OVERSIZE = 598  # nonstandard sentinel: body exceeded the size cap
                       # (permanent, lands in split_results' dead bucket
                       # — re-fetching an oversize body can't help)


def _http_worker(proxy, bypass, timeout, max_retries, retry_sleep,
                 warc_dir, rotate_bytes, user_agent, extract,
                 disabled_tags, max_body_bytes):
    """Build the Arrow fetch worker (a closure so the config rides the
    serialized function, not a driver-side object reference)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import urllib.error
        import urllib.request

        from pyspark import TaskContext

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            # 3xx must surface as a redirect ROW (capture.go:120-178),
            # never be followed silently
            def redirect_request(self, *a, **k):
                return None

        direct = urllib.request.build_opener(
            _NoRedirect, urllib.request.ProxyHandler({})
        )
        proxied = (
            urllib.request.build_opener(
                _NoRedirect,
                urllib.request.ProxyHandler({"http": proxy, "https": proxy}),
            )
            if proxy
            else direct
        )

        writer = None
        if warc_dir:
            from zeno_spark.operators.warc import WarcWriter

            # task ATTEMPT id, not partition id: unique across rounds and
            # across speculative/retried attempts, so no two tasks ever
            # write the same file series
            ctx = TaskContext.get()
            tid = ctx.taskAttemptId() if ctx else 0
            writer = WarcWriter(
                warc_dir, f"live-{tid:08d}", 0, rotate_bytes=rotate_bytes
            )

        from zeno_spark.operators.fetch import proxy_for_host

        def one_get(url, host, referer):
            # X4 routing through the ONE tested helper — an inline
            # re-derivation here could silently diverge from it
            opener = direct if proxy_for_host(host, proxy, bypass) is None else proxied
            req = urllib.request.Request(
                url, headers={"User-Agent": user_agent}
            )
            if referer:
                req.add_header("Referer", referer)
            last_err = None
            for attempt in range(max_retries + 1):
                try:
                    with opener.open(req, timeout=timeout) as resp:
                        # bounded read: a crawl trap streaming an
                        # unbounded body must not OOM the executor —
                        # oversize is a PERMANENT condition (distinct
                        # from the retryable status-0 conn failure)
                        body = resp.read(max_body_bytes + 1)
                        if len(body) > max_body_bytes:
                            return STATUS_OVERSIZE, dict(resp.headers), None
                        return resp.status, dict(resp.headers), body
                except urllib.error.HTTPError as e:
                    # a response, not a failure: keep status + headers
                    body = b""
                    try:
                        body = e.read(max_body_bytes)
                    except Exception:
                        pass
                    return e.code, dict(e.headers or {}), body
                except Exception as e:  # connection-level failure
                    last_err = e
                    if attempt < max_retries and retry_sleep:
                        time.sleep(retry_sleep * (attempt + 1))
            del last_err
            return None, {}, None

        def _int_or_none(v, lo=-(2 ** 63), hi=2 ** 63 - 1):
            # hostile/malformed server headers must not crash the task
            # (a deterministic ValueError/OverflowError would fail every
            # Spark retry and abort the whole round for one URL)
            try:
                n = int(v)
            except (TypeError, ValueError):
                return None
            return n if lo <= n <= hi else None

        names = [f.name for f in RESPONSES.fields]
        for b in batches:
            idx = {n: i for i, n in enumerate(b.schema.names)}
            urls = b.column(idx["url"]).to_pylist()
            hosts = b.column(idx["host"]).to_pylist()
            parents = b.column(idx["parent_url"]).to_pylist()
            out: dict[str, list] = {n: [] for n in names}
            for i, url in enumerate(urls):
                status, headers, body = one_get(url, hosts[i], parents[i])
                hh = {k.lower(): v for k, v in headers.items()}
                ct = (hh.get("content-type") or "").split(";")[0].strip() or None
                fmt = hh.get("x-zeno-fmt") or (
                    ct.removeprefix("image/") if ct and ct.startswith("image/")
                    else None
                )
                is_ok = status == 200
                out["image_id"].append(hh.get("x-zeno-image-id") if is_ok else None)
                out["w"].append(
                    _int_or_none(hh["x-zeno-w"], -(2 ** 31), 2 ** 31 - 1)
                    if is_ok and "x-zeno-w" in hh else None
                )
                out["h"].append(
                    _int_or_none(hh["x-zeno-h"], -(2 ** 31), 2 ** 31 - 1)
                    if is_ok and "x-zeno-h" in hh else None
                )
                out["fmt"].append(fmt if is_ok else None)
                out["caption"].append(hh.get("x-zeno-caption") if is_ok else None)
                phash = hh.get("x-zeno-phash")
                out["phash"].append(_int_or_none(phash) if is_ok else None)
                out["content_type"].append(ct)
                out["redirect_to"].append(
                    hh.get("location")
                    if status is not None and 300 <= status <= 399
                    else None
                )
                out["__page_status"].append(status)
                out["__retry_after"].append(
                    retry_after_seconds(hh.get("retry-after"))
                    if status == 429 else None
                )
                out["__bytes"].append(body if is_ok else None)
                # the verify worker int()s this sidecar: pass it through
                # only when it parses (same guard as the phash column)
                out["__adv_phash"].append(
                    phash if is_ok and _int_or_none(phash) is not None
                    else None
                )
                if extract and is_ok and body:
                    # P1-P12 on the live body while it's in hand
                    # (capture.go:459-501 runs the extractors inside the
                    # capture worker for the same reason: the payload
                    # never needs a second trip)
                    from zeno_spark.operators.parse import route_extract

                    text = body.decode("utf-8", "replace")
                    o, a = route_extract(
                        url, ct or "", text,
                        link_header=hh.get("link"),
                        server_header=hh.get("server"),
                        disabled_tags=disabled_tags,
                    )
                    out["__outlinks"].append(o)
                    out["__assets"].append(a)
                else:
                    out["__outlinks"].append(None)
                    out["__assets"].append(None)
                if writer is not None and status is not None:
                    import uuid as _uuid
                    from datetime import datetime, timezone

                    from zeno_spark.operators import warc as W

                    xh = {
                        k: v for k, v in headers.items()
                        if k.lower().startswith("x-zeno-")
                    }
                    if 300 <= status <= 399 and hh.get("location"):
                        xh["Location"] = hh["location"]
                    # live capture: every wire event gets a UNIQUE
                    # record id (taskAttemptId + per-writer sequence —
                    # repeat fetches of one URL across retries/rounds
                    # are distinct records per WARC 1.1) and a real
                    # timestamp; determinism is a batch-sink property,
                    # not a live-wire one
                    rec_seq = getattr(writer, "_live_seq", 0)
                    writer._live_seq = rec_seq + 2
                    rid = "<urn:uuid:%s>" % _uuid.uuid5(
                        _uuid.NAMESPACE_URL,
                        f"live|{writer.prefix}|{rec_seq}|{url}",
                    )
                    req_id = "<urn:uuid:%s>" % _uuid.uuid5(
                        _uuid.NAMESPACE_URL,
                        f"live|{writer.prefix}|{rec_seq + 1}|{url}",
                    )
                    now = datetime.now(timezone.utc).strftime(
                        "%Y-%m-%dT%H:%M:%SZ"
                    )
                    # request side of the exchange, with the headers
                    # one_get ACTUALLY sent (UA + optional Referer) —
                    # the reference's recording client captures both
                    # sides (crawl/crawl.go:101-119)
                    sent = {"User-Agent": user_agent}
                    if parents[i]:
                        sent["Referer"] = parents[i]
                    writer.add(
                        W.request_record(
                            url, 0, sent, concurrent_to=rid,
                            record_id=req_id, warc_date=now,
                        )
                    )
                    writer.add(
                        W.response_record(
                            url, 0, status, ct or "application/octet-stream",
                            body or b"", None, xh,
                            record_id=rid, warc_date=now,
                        )
                    )
            for n in _CARRY:
                out[n] = b.column(idx[n])
            yield pa.RecordBatch.from_arrays(
                [
                    out[n] if isinstance(out[n], pa.Array)
                    else pa.array(out[n], type=_pa_type(n))
                    for n in names
                ],
                names=names,
            )
        if writer is not None:
            writer.close()

    return gen


def _pa_type(name: str):
    dt = {f.name: f.dataType for f in RESPONSES.fields}[name]
    return {
        "string": pa.string(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "binary": pa.binary(),
        "boolean": pa.bool_(),
        "double": pa.float64(),
        "array<string>": pa.list_(pa.string()),
    }[dt.simpleString()]


class HttpTransport:
    """Real-socket transport: GETs happen inside the Arrow worker, one
    batch at a time.  ``proxy``/``bypass`` implement X4 routing
    (capture.go:60-64); ``warc_dir`` turns on streaming WARC capture;
    ``extract=True`` runs the P1-P12 extractors on each live body inside
    the worker (so CrawlJob needs no links table — the crawl becomes a
    fully self-contained live crawler)."""

    covers_all = True
    deterministic_429 = False

    def __init__(
        self,
        proxy: str | None = None,
        bypass: tuple[str, ...] = (),
        timeout: float = 10.0,
        max_retries: int = 1,
        retry_sleep: float = 0.0,
        warc_dir: str | None = None,
        rotate_bytes: int = 1 << 30,
        user_agent: str = _USER_AGENT,
        extract: bool = False,
        disabled_tags: frozenset[str] = frozenset(),
        max_body_bytes: int = 64 << 20,
    ):
        self.proxy = proxy
        self.bypass = tuple(bypass)
        self.timeout = timeout
        self.max_retries = max_retries
        self.retry_sleep = retry_sleep
        self.warc_dir = warc_dir
        self.rotate_bytes = rotate_bytes
        self.user_agent = user_agent
        self.extract = extract
        self.disabled_tags = frozenset(disabled_tags)
        self.max_body_bytes = max_body_bytes

    def responses(self, scheduled: DataFrame, cfg=None) -> DataFrame:
        worker = _http_worker(
            self.proxy, self.bypass, self.timeout, self.max_retries,
            self.retry_sleep, self.warc_dir, self.rotate_bytes,
            self.user_agent, self.extract, self.disabled_tags,
            self.max_body_bytes,
        )
        return scheduled.mapInArrow(worker, schema=RESPONSES)


def _replay_worker(warc_dir, extract, disabled_tags):
    """Arrow worker for WarcReplayTransport: per row, seek+decompress
    exactly the gzip member(s) the CDX resolution named — never a file
    scan.  A tiny per-task handle cache keeps one open fd per WARC file
    (rows arrive sorted by (file, offset), so reads within a task are a
    forward sweep of each file)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import os
        import zlib

        from zeno_spark.operators.warc import (
            decode_header_value,
            parse_http_block,
            parse_warc_stream,
        )

        handles: dict[str, object] = {}

        def record(fname, off, length):
            fh = handles.pop(fname, None)  # re-insert: LRU at dict tail
            if fh is None:
                if len(handles) >= 8:  # evict LEAST recently used (head)
                    handles.pop(next(iter(handles))).close()
                fh = open(os.path.join(warc_dir, fname), "rb")
            handles[fname] = fh
            fh.seek(off)
            [rec] = list(parse_warc_stream(
                zlib.decompress(fh.read(length), 31)))
            return rec

        def _int_or_none(v, lo=-(2 ** 63), hi=2 ** 63 - 1):
            try:
                n = int(v)
            except (TypeError, ValueError):
                return None
            return n if lo <= n <= hi else None

        names = [f.name for f in RESPONSES.fields]
        for b in batches:
            idx = {n: i for i, n in enumerate(b.schema.names)}
            col = lambda n: b.column(idx[n]).to_pylist()  # noqa: E731
            urls = col("url")
            hf, ho, hl = col("hdr_filename"), col("hdr_offset"), col("hdr_length")
            pf, po, pl = col("pay_filename"), col("pay_offset"), col("pay_length")
            out: dict[str, list] = {n: [] for n in names}
            for i, url in enumerate(urls):
                hdr = record(hf[i], ho[i], hl[i])
                status, hh, body = parse_http_block(hdr["block"])
                if (pf[i], po[i]) != (hf[i], ho[i]):
                    # revisit capture: headers/status are the revisit's,
                    # payload bytes live in the stitched original record
                    _, _, body = parse_http_block(
                        record(pf[i], po[i], pl[i])["block"])
                ct = (hh.get("content-type") or "").split(";")[0].strip() or None
                fmt = None
                if "x-zeno-fmt" in hh:
                    fmt = decode_header_value(hh["x-zeno-fmt"])
                elif ct and ct.startswith("image/"):
                    fmt = ct.removeprefix("image/")
                is_ok = status == 200

                def xz(key):
                    v = hh.get(key)
                    return decode_header_value(v) if v is not None else None

                out["image_id"].append(xz("x-zeno-image-id") if is_ok else None)
                out["w"].append(
                    _int_or_none(hh["x-zeno-w"], -(2 ** 31), 2 ** 31 - 1)
                    if is_ok and "x-zeno-w" in hh else None
                )
                out["h"].append(
                    _int_or_none(hh["x-zeno-h"], -(2 ** 31), 2 ** 31 - 1)
                    if is_ok and "x-zeno-h" in hh else None
                )
                out["fmt"].append(fmt if is_ok else None)
                out["caption"].append(xz("x-zeno-caption") if is_ok else None)
                phash = hh.get("x-zeno-phash")
                out["phash"].append(_int_or_none(phash) if is_ok else None)
                out["content_type"].append(ct)
                out["redirect_to"].append(
                    hh.get("location") if 300 <= status <= 399 else None
                )
                out["__page_status"].append(status)
                out["__retry_after"].append(None)
                out["__bytes"].append(body if is_ok else None)
                out["__adv_phash"].append(
                    phash if is_ok and _int_or_none(phash) is not None
                    else None
                )
                if extract and is_ok and body:
                    from zeno_spark.operators.parse import route_extract

                    o, a = route_extract(
                        url, ct or "", body.decode("utf-8", "replace"),
                        link_header=None, server_header=None,
                        disabled_tags=disabled_tags,
                    )
                    out["__outlinks"].append(o)
                    out["__assets"].append(a)
                else:
                    out["__outlinks"].append(None)
                    out["__assets"].append(None)
            for n in _CARRY:
                out[n] = b.column(idx[n])
            yield pa.RecordBatch.from_arrays(
                [
                    out[n] if isinstance(out[n], pa.Array)
                    else pa.array(out[n], type=_pa_type(n))
                    for n in names
                ],
                names=names,
            )
        for fh in handles.values():
            fh.close()

    return gen


class WarcReplayTransport:
    """Archive-replay transport: the "wire" is a PRIOR crawl's WARC
    archive, resolved through its CDXJ index — what a wayback-style
    replay stack does per request, expressed as the fetch seam so the
    ENTIRE crawl plan (admission, politeness, dedupe, extraction) runs
    unchanged over archived traffic.  Re-crawling from an archive is the
    standard QA/derivation workflow on the reference's output (its
    WARCs are consumed through pywb/OpenWayback replay).

    Resolution (cdx.resolve_captures): latest capture per URL,
    deterministic tiebreak; a revisit capture serves its own
    status/headers with the payload block of the earliest
    payload-carrying capture of the same digest (the record its
    WARC-Refers-To names).  A URL absent from the index — or a revisit
    whose original is missing — yields NO response row, and
    ``covers_all=False`` routes it through fetch_meta's native-404
    path: not archived is a deterministic miss, not a transient.
    ``deterministic_429=False``: an archived 429 is a fact and never
    "recovers" on retry.

    Scale shape: the index scan is semi-join pruned by the round's
    broadcast URL set before any aggregation (the archive is never
    shuffled); the resolved extents (<= round cardinality) broadcast
    back onto the scheduled rows, which then hash-partition by WARC
    file and sort by offset so each task's reads are a forward sweep
    of few files; the worker decompresses exactly one gzip member per
    record — the seekability the one-member-per-record WARC layout and
    the CDXJ offset/length fields exist to provide.  Payload bytes
    appear only between the member read and the verify worker, same
    discipline as the live transport.

    ``extract=True`` runs the P1-P12 extractors on replayed bodies
    (self-contained replay of a live-crawled archive, no links table).
    """

    covers_all = False
    deterministic_429 = False

    def __init__(
        self,
        warc_dir: str,
        index: DataFrame,
        extract: bool = False,
        disabled_tags: frozenset[str] = frozenset(),
    ):
        self.warc_dir = warc_dir
        self.index = index
        self.extract = extract
        self.disabled_tags = frozenset(disabled_tags)

    @classmethod
    def from_dirs(cls, spark, warc_dir: str, cdx_dir: str | None = None,
                  **kw) -> "WarcReplayTransport":
        """Build from directories: with ``cdx_dir``, lookups go through
        the prior crawl's on-disk .cdxj shards (the production shape —
        index once, replay many; left UNCACHED, a 10^10-row index must
        not be pinned in executor memory and its pruned scans are
        cheap); without, the archive is indexed in-memory first (small
        archives / tests) and CACHED — resolve_captures references the
        index twice per round, and re-deriving it would gzip-decompress
        and header-parse the whole archive each time."""
        from zeno_spark.operators.cdx import cdxj_index, read_cdxj

        idx = (read_cdxj(spark, cdx_dir) if cdx_dir
               else cdxj_index(spark, warc_dir).cache())
        return cls(warc_dir, idx, **kw)

    def responses(self, scheduled: DataFrame, cfg=None) -> DataFrame:
        from zeno_spark.operators.cdx import resolve_captures

        resolved = resolve_captures(
            self.index, scheduled.select("url")
        ).drop("ts", "status")
        placed = (
            scheduled.join(F.broadcast(resolved), "url", "inner")
            .repartition(F.col("hdr_filename"))
            .sortWithinPartitions("hdr_filename", "hdr_offset")
        )
        worker = _replay_worker(self.warc_dir, self.extract,
                                self.disabled_tags)
        return placed.mapInArrow(worker, schema=RESPONSES)
