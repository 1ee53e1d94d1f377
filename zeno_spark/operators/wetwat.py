"""WET / WAT derived formats over the WARC archive (S6 adjunct).

The reference stops at the raw archive: its WARC-writing client records
wire traffic (crawl/crawl.go:101-119) and nothing downstream.  But the
ecosystem around web archives — and every LLM training-data pipeline
built on one (Common Crawl's WET extracts are the canonical corpus
substrate) — consumes two standard DERIVED formats, both themselves
WARC containers (public Common Crawl format documentation):

  * **WET** — text conversion: one ``WARC-Type: conversion`` record per
    successfully captured page, block = the page's extracted plain
    text, linked to the source capture via ``WARC-Refers-To``.  For
    this engine's image+caption corpus (BASELINE input_hint) the text
    of an image page is its caption; HTML bodies go through a
    boilerplate-free tag strip (`html_to_text`).
  * **WAT** — metadata: one ``WARC-Type: metadata`` record per capture
    (originals AND revisits), block = a canonical-JSON envelope of the
    capture's headers, dimensions, digest, and extracted outlinks.

Both writers are distributed exactly like ``write_warc``
(operators/warc.py): ``mapInArrow`` per partition, rotating
one-gzip-member-per-record files, ``.open`` staging names, and a
driver-side two-phase job commit that publishes only winning task
attempts — so a retried/speculative attempt can never double-publish.
The WET path is the only one that touches payload bytes, and they flow
parquet scan -> worker -> text extraction without ever shuffling or
crossing into pandas (the repo-wide payload discipline).

Cross-format contract: the ``WARC-Refers-To`` id of every derived
record is derived with the SAME (type, url, round, digest) uuid5 the
batch archive export uses, so a WET/WAT corpus produced from the
fetched table links record-for-record into the ``write_warc`` archive
of the same table — tested in tests/test_wetwat.py.

Determinism: record ids, dates, JSON key order, and gzip members are
all deterministic, so identical inputs emit byte-identical WET/WAT
files (the repo-wide sink reproducibility contract).
"""

from __future__ import annotations

import hashlib
import html as _html
import json
import os
import re
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeno_spark.operators.warc import (
    MANIFEST,
    OPEN_SUFFIX,
    WarcWriter,
    _record_id,
    _warc_date,
    build_record,
    parse_warc_stream,
)

_SCRIPT_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def html_to_text(payload: bytes) -> str:
    """Plain-text conversion of an HTML body: drop script/style blocks,
    strip tags, decode entities, collapse whitespace.  Deliberately
    boilerplate-simple (the WET contract is 'the page's text', not a
    readability model); total over arbitrary bytes."""
    if not payload:
        return ""
    body = _SCRIPT_RE.sub(b" ", payload)
    body = _TAG_RE.sub(b" ", body)
    text = body.decode("utf-8", "replace")
    return _WS_RE.sub(" ", _html.unescape(text)).strip()


def extract_text(fmt: str | None, caption: str | None,
                 payload: bytes | None) -> str:
    """The WET text of a capture: an image page's text is its caption
    (the input_hint corpus shape); anything else is treated as markup
    and tag-stripped."""
    if fmt:
        return (caption or "").strip()
    return html_to_text(payload or b"")


def conversion_record(url: str, round_no: int, text: str,
                      refers_to: str) -> bytes:
    block = text.encode("utf-8")
    return build_record(
        "conversion",
        {
            "WARC-Record-ID": _record_id("conversion", url, round_no,
                                         refers_to),
            "WARC-Date": _warc_date(round_no),
            "WARC-Target-URI": url,
            "WARC-Refers-To": refers_to,
            "WARC-Payload-Digest":
                "sha256:" + hashlib.sha256(block).hexdigest(),
            "Content-Type": "text/plain",
        },
        block,
    )


def wat_record(url: str, round_no: int, meta_json: str,
               refers_to: str) -> bytes:
    block = meta_json.encode("utf-8")
    return build_record(
        "metadata",
        {
            "WARC-Record-ID": _record_id("wat", url, round_no, refers_to),
            "WARC-Date": _warc_date(round_no),
            "WARC-Target-URI": url,
            "WARC-Refers-To": refers_to,
            "Content-Type": "application/json",
        },
        block,
    )


def _source_record_id(url, round_no, digest, revisit) -> str:
    """The id write_warc gave this capture's response/revisit record
    (warc.py response_record/revisit_record derivation)."""
    return _record_id("revisit" if revisit else "response",
                      url, round_no, digest)


def _job_commit(manifest_rows, out_dir: str, stage_prefix: str) -> None:
    """write_warc's two-phase commit, shared by the derived-format
    sinks: publish exactly the winning attempts' staged files, sweep
    only THIS export's loser staging files (prefix-scoped so a WET and
    a WAT export can share the archive directory)."""
    missing = [
        r.warc_file for r in manifest_rows
        if not os.path.exists(r.warc_file + OPEN_SUFFIX)
        and not os.path.exists(r.warc_file)
    ]
    if missing:
        raise RuntimeError(
            "derived-format job commit: staged files not visible to "
            f"the driver (out_dir must be driver+executor shared): "
            f"{missing[:3]}"
        )
    for r in manifest_rows:
        if os.path.exists(r.warc_file + OPEN_SUFFIX):
            os.rename(r.warc_file + OPEN_SUFFIX, r.warc_file)
    if os.path.isdir(out_dir):
        for fname in os.listdir(out_dir):
            if (fname.startswith(stage_prefix)
                    and fname.endswith(".warc.gz" + OPEN_SUFFIX)):
                os.remove(os.path.join(out_dir, fname))


_WET_COLS = ["url", "round", "status", "fmt", "caption", "bytes",
             "payload_digest", "revisit"]


def _wet_batches(out_dir: str, rotate_bytes: int):
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        tid = ctx.taskAttemptId() if ctx else 0
        writer = WarcWriter(out_dir, f"zeno-wet-{tid:08d}", 0,
                            rotate_bytes=rotate_bytes)
        for b in batches:
            idx = {n: i for i, n in enumerate(b.schema.names)}

            def val(name, i):
                v = b.column(idx[name])[i]
                return v.as_py() if v.is_valid else None

            for i in range(b.num_rows):
                text = extract_text(val("fmt", i), val("caption", i),
                                    val("bytes", i))
                if not text:
                    continue  # CC discipline: only records with text
                url = val("url", i)
                round_no = val("round", i) or 0
                writer.round_no = round_no
                writer.add(conversion_record(
                    url, round_no, text,
                    _source_record_id(url, round_no,
                                      val("payload_digest", i), False),
                ))
        writer.close(publish=False)
        yield pa.RecordBatch.from_arrays(
            [pa.array(writer.files, type=pa.string()),
             pa.array(writer.file_records, type=pa.int64()),
             pa.array(writer.file_bytes, type=pa.int64())],
            names=["warc_file", "records", "bytes"],
        )
    return gen


def write_wet(fetched: DataFrame, out_dir: str,
              rotate_bytes: int = 1 << 30) -> DataFrame:
    """Derive the WET text corpus from fetched-table rows (or
    ``read_warc`` output — same shape).  Only original (non-revisit)
    2xx captures with extractable text emit a record; each links back
    to its archive response via WARC-Refers-To.  Distributed, payload
    discipline and job-commit protocol identical to ``write_warc``."""
    rows = fetched.filter(
        (~F.coalesce(F.col("revisit"), F.lit(False)))
        & F.col("status").between(200, 299)
    )
    cols = [
        (F.col(c) if c in rows.columns else F.lit(None)).alias(c)
        for c in _WET_COLS
    ]
    manifest = rows.select(*cols).mapInArrow(
        _wet_batches(out_dir, rotate_bytes), schema=MANIFEST
    ).collect()
    _job_commit(manifest, out_dir, "zeno-wet-")
    return fetched.sparkSession.createDataFrame(manifest, MANIFEST)


_WAT_COLS = ["url", "round", "status", "fmt", "w", "h", "caption",
             "payload_digest", "revisit", "refers_to_url",
             "refers_to_date", "__outlinks"]


def _wat_batches(out_dir: str, rotate_bytes: int):
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        tid = ctx.taskAttemptId() if ctx else 0
        writer = WarcWriter(out_dir, f"zeno-wat-{tid:08d}", 0,
                            rotate_bytes=rotate_bytes)
        for b in batches:
            idx = {n: i for i, n in enumerate(b.schema.names)}

            def val(name, i):
                v = b.column(idx[name])[i]
                return v.as_py() if v.is_valid else None

            for i in range(b.num_rows):
                url = val("url", i)
                round_no = val("round", i) or 0
                writer.round_no = round_no
                revisit = bool(val("revisit", i))
                digest = val("payload_digest", i)
                env = {
                    "Envelope": {
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI": url,
                            "WARC-Date": _warc_date(round_no),
                            "WARC-Type":
                                "revisit" if revisit else "response",
                            **({"WARC-Payload-Digest":
                                f"sha256:{digest}"} if digest else {}),
                        },
                        "Payload-Metadata": {
                            "Actual-Content-Type":
                                (f"image/{val('fmt', i)}"
                                 if val("fmt", i) else "text/html"),
                            "HTTP-Response-Metadata": {
                                "Response-Status": val("status", i),
                            },
                            **({"Image-Metadata": {
                                    "Width": val("w", i),
                                    "Height": val("h", i),
                                }} if val("w", i) is not None else {}),
                            **({"Caption-Length":
                                len(val("caption", i))}
                               if val("caption", i) is not None else {}),
                            "Links": [
                                {"url": u}
                                for u in (val("__outlinks", i) or [])
                            ],
                        },
                    }
                }
                if revisit and val("refers_to_url", i):
                    env["Envelope"]["WARC-Header-Metadata"][
                        "WARC-Refers-To-Target-URI"
                    ] = val("refers_to_url", i)
                meta = json.dumps(env, sort_keys=True,
                                  separators=(",", ":"))
                writer.add(wat_record(
                    url, round_no, meta,
                    _source_record_id(url, round_no, digest, revisit),
                ))
        writer.close(publish=False)
        yield pa.RecordBatch.from_arrays(
            [pa.array(writer.files, type=pa.string()),
             pa.array(writer.file_records, type=pa.int64()),
             pa.array(writer.file_bytes, type=pa.int64())],
            names=["warc_file", "records", "bytes"],
        )
    return gen


def write_wat(fetched: DataFrame, out_dir: str,
              discovered: DataFrame | None = None,
              rotate_bytes: int = 1 << 30) -> DataFrame:
    """Derive the WAT metadata corpus: one canonical-JSON envelope per
    capture (originals and revisits).  ``discovered`` — frontier rows
    (url, parent_url), e.g. the crawl's frontier table — supplies each
    page's extracted outlinks: they are grouped per parent (sorted,
    deduped, so the envelope is deterministic) and joined in; the WAT
    row set is narrow (no payload bytes), so this join shuffles only
    metadata."""
    rows = fetched
    if discovered is not None:
        links = (
            discovered
            .filter(F.col("parent_url").isNotNull()
                    & (F.col("parent_url") != ""))
            .groupBy(F.col("parent_url").alias("url"))
            .agg(F.sort_array(F.collect_set("url")).alias("__outlinks"))
        )
        rows = rows.join(links, "url", "left")
    else:
        rows = rows.withColumn(
            "__outlinks", F.lit(None).cast(T.ArrayType(T.StringType()))
        )
    cols = [
        (F.col(c) if c in rows.columns else F.lit(None)).alias(c)
        for c in _WAT_COLS
    ]
    manifest = rows.select(*cols).mapInArrow(
        _wat_batches(out_dir, rotate_bytes), schema=MANIFEST
    ).collect()
    _job_commit(manifest, out_dir, "zeno-wat-")
    return fetched.sparkSession.createDataFrame(manifest, MANIFEST)


# ---------------------------------------------------------------------------
# readers (binaryFile source + stdlib parse, read_warc discipline)
# ---------------------------------------------------------------------------

WET_ROWS = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("date", T.StringType(), False),
    T.StructField("refers_to", T.StringType(), True),
    T.StructField("text", T.StringType(), False),
])

WAT_ROWS = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("date", T.StringType(), False),
    T.StructField("refers_to", T.StringType(), True),
    T.StructField("meta", T.StringType(), False),
])


def _read_derived(spark: SparkSession, path: str, rec_type: str,
                  schema: T.StructType, glob: str) -> DataFrame:
    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            contents = b.column(b.schema.names.index("content"))
            urls, dates, refs, texts = [], [], [], []
            for i in range(b.num_rows):
                data = contents[i].as_py()
                for rec in parse_warc_stream(data):
                    if rec["type"] != rec_type:
                        continue
                    h = rec["headers"]
                    urls.append(h.get("WARC-Target-URI", ""))
                    dates.append(h.get("WARC-Date", ""))
                    refs.append(h.get("WARC-Refers-To"))
                    texts.append(rec["block"].decode("utf-8", "replace"))
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls), pa.array(dates), pa.array(refs),
                 pa.array(texts)],
                names=[f.name for f in schema.fields],
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )
    return files.mapInArrow(parse, schema=schema)


def read_wet(spark: SparkSession, path: str,
             glob: str = "zeno-wet-*.warc.gz") -> DataFrame:
    """Load a WET corpus back as (url, date, refers_to, text) rows —
    the entry point for feeding the datapipe text/dedup tiers from an
    archive-derived corpus.  The default ``glob`` selects only THIS
    sink's output; pass e.g. ``glob="*.warc.wet.gz"`` to read an
    externally produced (Common Crawl-shaped) WET corpus — the record
    parser itself is format-level (conversion records per the WARC/1.1
    + CC-WET layout), only the filename filter is ours."""
    return _read_derived(spark, path, "conversion", WET_ROWS, glob)


def read_wat(spark: SparkSession, path: str,
             glob: str = "zeno-wat-*.warc.gz") -> DataFrame:
    """Load a WAT corpus as (url, date, refers_to, meta-JSON) rows;
    parse ``meta`` further with F.from_json / get_json_object.  Pass
    ``glob="*.warc.wat.gz"`` for an externally produced WAT corpus
    (the default selects only this sink's output)."""
    return _read_derived(spark, path, "metadata", WAT_ROWS, glob)
