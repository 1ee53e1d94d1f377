"""WARC container emission/ingestion (S6 parity, operators/warc.py).

The reference sinks captures into rotating gzip WARCs via its recording
client (crawl/crawl.go:101-119, crawl/warc.go:11-26).  These tests
check the standards-shaped framing (every record individually
parseable, digests correct), rotation, byte-determinism, and the
Spark-level fetched-table -> .warc.gz -> fetched-rows roundtrip."""

from __future__ import annotations

import glob
import gzip
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from zeno_spark import fixtures
from zeno_spark.config import CrawlConfig
from zeno_spark.operators import warc as W
from zeno_spark.plans.crawl import CrawlJob


# ---------------------------------------------------------------------------
# pure framing
# ---------------------------------------------------------------------------

def test_record_framing_roundtrip():
    payload = b"\x89PNG fake payload" * 10
    rec = W.response_record(
        "http://h.example/p/1", 3, 200, "image/png", payload,
        hashlib.sha256(payload).hexdigest(), {"X-Zeno-Caption": "maple onyx"},
    )
    [parsed] = list(W.parse_warc_stream(rec))
    assert parsed["type"] == "response"
    h = parsed["headers"]
    assert h["WARC-Target-URI"] == "http://h.example/p/1"
    assert h["WARC-Block-Digest"] == (
        "sha256:" + hashlib.sha256(parsed["block"]).hexdigest()
    )
    status, hh, body = W.parse_http_block(parsed["block"])
    assert status == 200
    assert hh["content-type"] == "image/png"
    assert hh["x-zeno-caption"] == "maple onyx"
    assert body == payload


def test_request_record_framing():
    """Paired request records (crawl/crawl.go:101-119: the recording
    client captures both sides of every exchange): GET line with path+
    query, Host header, msgtype=request, WARC-Concurrent-To link."""
    rec = W.request_record(
        "http://h.example/p/1?a=2", 3,
        {"User-Agent": "zeno-test/1.0", "Referer": "http://h.example/"},
        concurrent_to="<urn:uuid:resp-id>",
    )
    [parsed] = list(W.parse_warc_stream(rec))
    assert parsed["type"] == "request"
    h = parsed["headers"]
    assert h["WARC-Target-URI"] == "http://h.example/p/1?a=2"
    assert h["WARC-Concurrent-To"] == "<urn:uuid:resp-id>"
    assert h["Content-Type"] == "application/http;msgtype=request"
    assert h["WARC-Block-Digest"] == (
        "sha256:" + hashlib.sha256(parsed["block"]).hexdigest()
    )
    lines = parsed["block"].decode("utf-8").split("\r\n")
    assert lines[0] == "GET /p/1?a=2 HTTP/1.1"
    assert "Host: h.example" in lines
    assert "User-Agent: zeno-test/1.0" in lines
    assert "Referer: http://h.example/" in lines


def test_crlf_header_values_cannot_break_framing():
    """A header value carrying CRLF (hostile caption, Location header)
    must not corrupt the inner HTTP framing: parse_http_block has to
    return the true body and see no injected header."""
    payload = b"real body bytes"
    rec = W.response_record(
        "http://h.example/evil", 0, 200, "image/png", payload, None,
        {"X-Zeno-Caption": W.encode_header_value("line1\r\nInjected: x"),
         "Location": "http://t.example/\r\nX-Smuggled: 1"},
    )
    [parsed] = list(W.parse_warc_stream(rec))
    status, hh, body = W.parse_http_block(parsed["block"])
    assert status == 200
    assert body == payload
    assert "x-smuggled" not in hh
    assert "injected" not in hh
    # the encoded caption round-trips byte-exact
    assert W.decode_header_value(hh["x-zeno-caption"]) == "line1\r\nInjected: x"


def test_crlf_caption_roundtrips_through_spark_sink(spark, tmp_path):
    rows = [
        ("http://h.example/a", 200, b"payloadbytes-a", "two\nlines % 50",
         7, False, 0),
        ("http://h.example/b", 200, b"payloadbytes-b", "plain", 8, False, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, status int, bytes binary, caption string, "
        "phash long, revisit boolean, round int",
    )
    out = str(tmp_path / "warc_crlf")
    W.write_warc(df, out).collect()
    back = {r.url: r for r in W.read_warc(spark, out).collect()}
    assert back["http://h.example/a"].caption == "two\nlines % 50"
    assert back["http://h.example/b"].caption == "plain"


def test_revisit_record_has_no_payload():
    rec = W.revisit_record("http://h.example/p/2", 1, 200, "image/png", "ab" * 32)
    [parsed] = list(W.parse_warc_stream(rec))
    assert parsed["type"] == "revisit"
    assert parsed["headers"]["WARC-Profile"].endswith("identical-payload-digest")
    _, _, body = W.parse_http_block(parsed["block"])
    assert body == b""


def test_writer_rotation_and_determinism(tmp_path):
    def write(d):
        w = W.WarcWriter(str(d), "t", 0, rotate_bytes=2000)
        for i in range(30):
            w.add(W.response_record(
                f"http://h.example/p/{i}", 0, 200, "text/html",
                b"x" * 200, None))
        w.close()
        return w

    w1 = write(tmp_path / "a")
    w2 = write(tmp_path / "b")
    assert len(w1.files) > 1  # rotated
    assert w1.file_records == w2.file_records
    for f1, f2 in zip(w1.files, w2.files):
        assert open(f1, "rb").read() == open(f2, "rb").read()  # deterministic
    # every file independently parseable, warcinfo first
    for path, n in zip(w1.files, w1.file_records):
        recs = list(W.parse_warc_stream(open(path, "rb").read()))
        assert len(recs) == n
        assert recs[0]["type"] == "warcinfo"
    # gzip members concatenate: stdlib gunzip of the whole file works
    gzip.decompress(open(w1.files[0], "rb").read())


def test_dead_attempt_orphans_stay_out_of_the_corpus(spark, tmp_path):
    """A task attempt that dies mid-file leaves only an .open temp
    (rename-on-complete commit protocol): read_warc never sees it, and
    a later write_warc into the same directory sweeps it."""
    out = tmp_path / "warc_orphan"
    df = spark.createDataFrame(
        [("http://h.example/ok", 200, b"good-payload", "cap", 1, False, 0)],
        "url string, status int, bytes binary, caption string, "
        "phash long, revisit boolean, round int",
    )
    W.write_warc(df, str(out)).collect()
    # a dead attempt's partial file: truncated gzip under the .open name
    # (what a kill mid-member leaves behind), plus one mid-write writer
    good = next(out.glob("*.warc.gz")).read_bytes()
    orphan = out / "zeno-99999999-00000.warc.gz.open"
    orphan.write_bytes(good[: len(good) // 2])
    rows = W.read_warc(spark, str(out)).collect()
    assert [r.url for r in rows] == ["http://h.example/ok"]
    # the job commit sweeps the stale orphan on a re-export
    W.write_warc(df.limit(0), str(out)).collect()
    assert not list(out.glob("*.open"))
    # a writer killed before close() publishes NOTHING — including
    # files it completed before rotation (a retry re-writes them all,
    # so publishing any would duplicate records in the corpus)
    w = W.WarcWriter(str(tmp_path / "w2"), "t", 0, rotate_bytes=200)
    for i in range(8):
        w.add(W.response_record(f"http://h.example/{i}", 0, 200,
                                "text/html", b"z" * 120, None))
    assert len(w.files) > 2  # rotated several times
    assert not list((tmp_path / "w2").glob("*.warc.gz"))
    w.close()
    assert sorted(p.name for p in (tmp_path / "w2").glob("*.warc.gz")) == [
        f"t-{i:05d}.warc.gz" for i in range(len(w.files))
    ]
    assert not list((tmp_path / "w2").glob("*.open"))


# ---------------------------------------------------------------------------
# Spark sink/source roundtrip over a real crawl's fetched table
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def crawl_fetched(spark, tmp_path_factory):
    corpus = fixtures.build_corpus(spark, n_pages=120, n_hosts=8, seed=42)
    cfg = CrawlConfig(max_hops=2, per_host_budget=8, max_rounds=8,
                      payload_dedupe_min_size=64)
    wh = tmp_path_factory.mktemp("wh_warc")
    job = CrawlJob(spark, str(wh), corpus["pages"], corpus["links"], cfg)
    job.run(seeds=corpus["seeds"], max_rounds=cfg.max_rounds)
    return job.fetched.read().cache()


def test_warc_spark_roundtrip(spark, crawl_fetched, tmp_path):
    out = str(tmp_path / "warcs")
    manifest = W.write_warc(crawl_fetched, out).collect()
    n_rows = crawl_fetched.count()
    # one warcinfo per file + a request/response PAIR per row
    assert sum(m.records for m in manifest) == 2 * n_rows + len(manifest)
    assert sorted(m.warc_file for m in manifest) == sorted(
        glob.glob(os.path.join(out, "*.warc.gz")))

    back = W.read_warc(spark, out)
    # the fetched table holds only status-200 sink rows, one per url
    # (claims prevent re-fetch; retries of a 429 sink under the retry
    # attempt's single success), so url keys both sides
    a = {
        r.url: r
        for r in crawl_fetched.select(
            "url", "bytes", "caption", "phash", "status",
            "payload_digest", "revisit", "image_id", "w", "h", "fmt",
        ).collect()
    }
    assert len(a) == n_rows
    bb = {r.url: r for r in back.collect()}
    assert len(bb) == n_rows
    for url, row in a.items():
        got = bb[url]
        assert got.status == row.status
        assert got.caption == row.caption
        assert got.phash == row.phash
        assert got.image_id == row.image_id
        assert (got.w, got.h, got.fmt) == (row.w, row.h, row.fmt)
        assert got.payload_digest == row.payload_digest
        assert got.revisit == row.revisit
        if row.revisit:
            assert got.bytes is None  # revisit records carry no payload
        else:
            assert (got.bytes or None) == (row.bytes or None)


def test_request_records_pair_with_responses(spark, crawl_fetched, tmp_path):
    """Every response/revisit record in the export has exactly one
    request record whose WARC-Concurrent-To names its record id, in the
    same file, with a parseable GET block — the pairing CDX/replay
    tooling expects (r3 verdict missing #1)."""
    out = str(tmp_path / "warcs_req")
    W.write_warc(crawl_fetched, out,
                 request_headers={"User-Agent": "zeno-pair-test/1.0"}).collect()
    n_resp = n_req = 0
    for path in glob.glob(os.path.join(out, "*.warc.gz")):
        resp_ids = set()
        req_links = []
        for rec in W.parse_warc_stream(open(path, "rb").read()):
            if rec["type"] in ("response", "revisit"):
                resp_ids.add(rec["headers"]["WARC-Record-ID"])
            elif rec["type"] == "request":
                req_links.append(rec["headers"])
                lines = rec["block"].decode("utf-8").split("\r\n")
                assert lines[0].startswith("GET ")
                assert lines[0].endswith(" HTTP/1.1")
                assert "User-Agent: zeno-pair-test/1.0" in lines
        assert len(req_links) == len(resp_ids)
        for h in req_links:
            assert h["WARC-Concurrent-To"] in resp_ids
        # ids are unique across the pairing
        assert len({h["WARC-Record-ID"] for h in req_links}) == len(req_links)
        n_resp += len(resp_ids)
        n_req += len(req_links)
    assert n_resp == crawl_fetched.count() and n_req == n_resp


def test_write_warc_without_requests_keeps_legacy_layout(
    spark, crawl_fetched, tmp_path
):
    out = str(tmp_path / "warcs_noreq")
    manifest = W.write_warc(
        crawl_fetched, out, include_requests=False).collect()
    n_rows = crawl_fetched.count()
    assert sum(m.records for m in manifest) == n_rows + len(manifest)
    for path in glob.glob(os.path.join(out, "*.warc.gz")):
        for rec in W.parse_warc_stream(open(path, "rb").read()):
            assert rec["type"] != "request"


def test_warc_payload_digest_matches_block(spark, crawl_fetched, tmp_path):
    """WARC-Payload-Digest in the emitted records equals sha256 of the
    actual payload block (an external WARC tool's integrity check)."""
    out = str(tmp_path / "warcs2")
    W.write_warc(crawl_fetched.filter(~F.col("revisit")), out).collect()
    checked = 0
    for path in glob.glob(os.path.join(out, "*.warc.gz")):
        for rec in W.parse_warc_stream(open(path, "rb").read()):
            if rec["type"] != "response":
                continue
            digest = rec["headers"].get("WARC-Payload-Digest")
            if not digest:
                continue
            _, _, body = W.parse_http_block(rec["block"])
            if body:
                assert digest == "sha256:" + hashlib.sha256(body).hexdigest()
                checked += 1
    assert checked > 0
