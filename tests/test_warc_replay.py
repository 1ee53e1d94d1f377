"""WarcReplayTransport — the archive as the wire (operators/transport.py
+ cdx.resolve_captures): a crawl whose fetches resolve through a prior
crawl's CDXJ index and seek exactly one gzip member per record.  This is
the replay half of the WARC/CDX interop story (the reference's archives
are consumed through wayback-style replay stacks): write WARC -> index
CDXJ -> re-run the ENTIRE crawl plan over the archived traffic.

Coverage: resolution semantics (latest capture, deterministic tiebreak,
revisit payload stitch, absent-url drop) on both index shapes
(cdxj_index's record_type and the on-disk mime=warc/revisit
convention), transport mechanics over a hand-built archive (statuses,
redirects, meta decode, native-404 for unarchived urls), and the e2e:
a replay crawl is identical to an origin-table crawl over a pages
table reconstructed from the same archive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zeno_spark import fixtures
from zeno_spark.config import CrawlConfig
from zeno_spark.operators import cdx as C
from zeno_spark.operators import warc as W
from zeno_spark.operators.fetch import fetch_meta
from zeno_spark.operators.transport import WarcReplayTransport
from zeno_spark.plans.crawl import CrawlJob


def _sched_rows(spark, urls):
    """Urls shaped as scheduled frontier rows (test_transport's shape)."""
    from zeno_spark.functions import urls as U

    base = spark.createDataFrame([(u,) for u in urls], "url string")
    return base.select(
        F.sha1(F.col("url")).alias("id"),
        F.col("url"),
        U.fnv1a64_udf(F.col("url")).alias("url_hash"),
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("hop"),
        F.lit("seed").alias("type"),
        F.lit(False).alias("bypass_seencheck"),
        F.lit(0).alias("redirect"),
        F.lit(0).alias("retry"),
        F.monotonically_increasing_id().alias("enqueue_seq"),
        F.lit(0).alias("discovered_round"),
        F.lit(0).alias("not_before_round"),
        F.lit(0).alias("priority"),
    )


# ---------------------------------------------------------------------------
# resolution semantics
# ---------------------------------------------------------------------------

def _index(spark, rows, with_type):
    """Index frame in either shape: cdxj_index's (record_type column) or
    read_cdxj's (no record_type — revisits flagged by mime)."""
    data = []
    for url, ts, rtype, digest, fname, off, length in rows:
        mime = C.MIME_REVISIT if rtype == "revisit" else "image/png"
        data.append((url, ts, rtype, mime, digest, fname, off, length))
    df = spark.createDataFrame(
        data,
        "url string, ts string, record_type string, mime string, "
        "digest string, filename string, offset long, length long",
    ).withColumn("status", F.lit(200)).withColumn("surt", F.col("url"))
    return df if with_type else df.drop("record_type")


@pytest.mark.parametrize("with_type", [True, False])
def test_resolve_captures_semantics(spark, with_type):
    idx = _index(spark, [
        # two captures of /a: the LATEST wins
        ("http://h/a", "20250101000000", "response", "sha256:d1", "f1", 0, 10),
        ("http://h/a", "20260101000000", "response", "sha256:d2", "f1", 10, 10),
        # /b's latest capture is a revisit: payload stitches to the
        # EARLIEST response capture of the same digest (f1 offset 0)
        ("http://h/b", "20270101000000", "revisit", "sha256:d1", "f2", 0, 5),
        ("http://h/d1-late", "20251231000000", "response", "sha256:d1", "f3", 0, 10),
        # /c is a revisit whose original is NOT archived -> unresolvable
        ("http://h/c", "20250101000000", "revisit", "sha256:dX", "f2", 5, 5),
    ], with_type)
    wanted = spark.createDataFrame(
        [("http://h/a",), ("http://h/b",), ("http://h/c",), ("http://h/z",)],
        "url string")
    got = {r.url: r for r in C.resolve_captures(idx, wanted).collect()}

    assert set(got) == {"http://h/a", "http://h/b"}  # /c, /z unresolvable
    a = got["http://h/a"]
    assert (a.hdr_filename, a.hdr_offset, a.hdr_length) == ("f1", 10, 10)
    assert (a.pay_filename, a.pay_offset, a.pay_length) == ("f1", 10, 10)
    b = got["http://h/b"]
    assert (b.hdr_filename, b.hdr_offset, b.hdr_length) == ("f2", 0, 5)
    # stitched to the EARLIEST d1 capture, not the one at f3
    assert (b.pay_filename, b.pay_offset, b.pay_length) == ("f1", 0, 10)


def test_resolve_captures_null_mime_is_payload_carrying(spark):
    """A foreign archive's response capture may carry no Content-Type —
    its index row has a null mime.  The classifier must be null-safe:
    the capture stays in the originals pool, so revisits of its digest
    resolve instead of silently dropping to not-archived."""
    idx = spark.createDataFrame(
        [("http://h/orig", "20250101000000", None, "sha256:d1", "f1", 0, 10),
         ("http://h/dup", "20260101000000", C.MIME_REVISIT, "sha256:d1",
          "f2", 0, 5)],
        "url string, ts string, mime string, digest string, "
        "filename string, offset long, length long",
    ).withColumn("status", F.lit(200))
    wanted = spark.createDataFrame([("http://h/dup",)], "url string")
    [r] = C.resolve_captures(idx, wanted).collect()
    assert (r.pay_filename, r.pay_offset, r.pay_length) == ("f1", 0, 10)


# ---------------------------------------------------------------------------
# transport mechanics over a hand-built archive
# ---------------------------------------------------------------------------

@pytest.fixture()
def small_archive(spark, tmp_path):
    from zeno_spark.functions.images import (
        encode_png, generate_pixels, phash64,
    )

    out = str(tmp_path / "warc")
    w = W.WarcWriter(out, "t", 0)
    px = generate_pixels(7, 8, 9)
    body = encode_png(px)  # a real decodable payload: the verify
    phash = phash64(px)    # worker must keep the replayed row at 200
    digest = __import__("hashlib").sha256(body).hexdigest()
    w.add(W.response_record(
        "http://h/img", 0, 200, "image/png", body, digest,
        {"X-Zeno-Caption": W.encode_header_value(" spaced cap "),
         "X-Zeno-W": "8", "X-Zeno-H": "9", "X-Zeno-Phash": str(phash)}))
    w.add(W.revisit_record("http://h/dup", 1, 200, "image/png", digest,
                           {"X-Zeno-Caption": "dup cap"}))
    w.add(W.response_record(
        "http://h/moved", 0, 301, "text/html", b"", None,
        {"Location": "http://h/img"}))
    w.add(W.response_record("http://h/gone", 0, 404, "text/html", b"", None))
    w.close()
    return out, body


def test_replay_serves_archived_records(spark, small_archive):
    warc_dir, body = small_archive
    t = WarcReplayTransport.from_dirs(spark, warc_dir)
    sched = _sched_rows(spark, [
        "http://h/img", "http://h/dup", "http://h/moved", "http://h/gone",
        "http://h/never-crawled",
    ])
    got = {r.url: r for r in t.responses(sched).collect()}

    # not archived -> NO response row (covers_all=False contract)
    assert set(got) == {"http://h/img", "http://h/dup", "http://h/moved",
                        "http://h/gone"}
    img = got["http://h/img"]
    assert img["__page_status"] == 200
    assert img["__bytes"] == body
    assert (img.w, img.h, img.fmt) == (8, 9, "png")
    assert img.phash is not None
    assert img.caption == " spaced cap "  # encode/decode roundtrip
    # the revisit's payload stitched from the original's member
    dup = got["http://h/dup"]
    assert dup["__page_status"] == 200
    assert dup["__bytes"] == body
    assert dup.caption == "dup cap"  # headers are the revisit's own
    assert got["http://h/moved"].redirect_to == "http://h/img"
    assert got["http://h/moved"]["__page_status"] == 301
    assert got["http://h/gone"]["__page_status"] == 404

    # through fetch_meta, the unarchived url becomes a native 404
    meta = {r.url: r.status for r in fetch_meta(
        sched, None, transport=t).collect()}
    assert meta["http://h/never-crawled"] == 404
    assert meta["http://h/img"] == 200


def test_replay_extract_mode_parses_archived_html(spark, tmp_path):
    out = str(tmp_path / "warc")
    w = W.WarcWriter(out, "t", 0)
    html = b'<html><a href="http://h/next">n</a><img src="http://h/i.png"></html>'
    w.add(W.response_record("http://h/page", 0, 200, "text/html", html,
                            __import__("hashlib").sha256(html).hexdigest()))
    w.close()
    t = WarcReplayTransport.from_dirs(spark, out, extract=True)
    [r] = t.responses(_sched_rows(spark, ["http://h/page"])).collect()
    assert "http://h/next" in (r["__outlinks"] or [])
    assert "http://h/i.png" in (r["__assets"] or [])


# ---------------------------------------------------------------------------
# e2e: a replay crawl == an origin-table crawl over the same archive
# ---------------------------------------------------------------------------

def _pages_from_archive(spark, warc_dir):
    """Independent oracle for what the archive can serve: read_warc rows
    as a pages table, revisit rows' bytes filled from any response row
    sharing the digest (identical digest => identical bytes, so which
    original fills them cannot matter)."""
    rows = W.read_warc(spark, warc_dir)
    originals = (
        rows.filter(~F.col("revisit") & F.col("payload_digest").isNotNull())
        .groupBy("payload_digest")
        .agg(F.min("bytes").alias("__ob"))
    )
    return (
        rows.join(originals, "payload_digest", "left")
        .select(
            "url", "status",
            F.coalesce("bytes", "__ob").alias("bytes"),
            "image_id", "w", "h", "fmt", "caption", "phash",
            F.when(F.col("fmt").isNotNull(),
                   F.concat(F.lit("image/"), F.col("fmt")))
            .otherwise(F.lit("text/html")).alias("content_type"),
            F.lit(None).cast("string").alias("redirect_to"),
        )
    )


def test_replay_crawl_equals_archive_table_crawl(spark, tmp_path):
    corpus = fixtures.build_corpus(spark, n_pages=120, n_hosts=6, seed=42)
    cfg = CrawlConfig(max_hops=2, per_host_budget=8, max_rounds=8,
                      payload_dedupe_min_size=64)

    # crawl 1 produces the archive
    job1 = CrawlJob(spark, str(tmp_path / "wh1"), corpus["pages"],
                    corpus["links"], cfg)
    job1.run(seeds=corpus["seeds"], max_rounds=cfg.max_rounds)
    warc_dir = str(tmp_path / "warc")
    W.write_warc(job1.fetched.read(), warc_dir)
    cdx_dir = str(tmp_path / "cdx")
    C.write_cdxj(C.cdxj_index(spark, warc_dir), cdx_dir, shards=2)

    # crawl A: origin-table transport over the archive-derived pages
    pages_replay = _pages_from_archive(spark, warc_dir).cache()
    # every archived IMAGE must resolve to payload bytes (html rows
    # legitimately archive empty bodies — their content is the links
    # table, not the WARC block)
    assert pages_replay.filter(
        F.col("fmt").isNotNull() & F.col("bytes").isNull()).count() == 0
    jobA = CrawlJob(spark, str(tmp_path / "whA"), pages_replay,
                    corpus["links"], cfg)
    statsA = jobA.run(seeds=corpus["seeds"], max_rounds=cfg.max_rounds)

    # crawl B: replay transport through the ON-DISK cdxj shards
    t = WarcReplayTransport.from_dirs(spark, warc_dir, cdx_dir)
    jobB = CrawlJob(spark, str(tmp_path / "whB"), None, corpus["links"],
                    cfg, transport=t)
    statsB = jobB.run(seeds=corpus["seeds"], max_rounds=cfg.max_rounds)

    assert [s.__dict__ for s in statsA] == [s.__dict__ for s in statsB]
    key = lambda job: {  # noqa: E731
        r.url: (r.round, r.type, r.hop, r.status, r.caption, r.w, r.h,
                r.fmt, r.phash, r.payload_digest, r.revisit)
        for r in job.fetched.read().collect()
    }
    assert key(jobA) == key(jobB)
    seen = lambda job: {  # noqa: E731
        (r.url, r.type, r.round) for r in job.seen.read().collect()
    }
    assert seen(jobA) == seen(jobB)
    assert {tuple(r) for r in jobA.metrics.read().collect()} == {
        tuple(r) for r in jobB.metrics.read().collect()
    }
    # the replay crawl re-archived something: its fetched set is the
    # archived subset of crawl 1's (plus 404-dead rows it never stored)
    urls1 = {r.url for r in job1.fetched.read().collect()}
    assert set(key(jobB)) <= urls1 and key(jobB)
    pages_replay.unpersist()
