"""D8 remote tier — CDX-server payload dedupe across crawls
(crawl/crawl.go:97-98 ``DedupeOptions{CDXDedupe: true, CDXURL,
SizeThreshold}``): a payload whose digest is already archived in a
PRIOR crawl's CDX index becomes a revisit row that names the archive's
ORIGINAL capture via WARC-Refers-To-Target-URI / WARC-Refers-To-Date.

Three tiers of coverage: operator semantics (precedence, size exemption,
earliest-capture pick, digest-prefix handling), WARC header roundtrip
(export -> ingest keeps refers-to), and a full cross-crawl e2e: crawl 1
-> WARC -> CDXJ index -> crawl 2 dedupes against it without changing
routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zeno_spark.config import CrawlConfig
from zeno_spark.operators import cdx as C
from zeno_spark.operators import warc as W
from zeno_spark.operators.fetch import mark_cdx_revisits
from zeno_spark.plans.crawl import CrawlJob
from zeno_spark import fixtures
from zeno_spark.fixtures import build_metadata


def _archive(spark, rows):
    """Prior-crawl index in the read_cdxj row shape (digest carries the
    WARC header's ``sha256:`` prefix, ts is the 14-digit capture time)."""
    return spark.createDataFrame(rows, "digest string, ts string, url string")


# ---------------------------------------------------------------------------
# operator semantics
# ---------------------------------------------------------------------------

def test_mark_cdx_revisits_semantics(spark):
    big = b"x" * 2000
    rows = [
        # original whose digest is archived -> CDX revisit w/ refers-to
        ("http://a/1", big, "d1", False),
        # locally-marked revisit: keeps in-crawl marking, NO refers-to
        # (the reference's LocalDedupe short-circuits the CDX lookup)
        ("http://a/2", None, "d1", True),
        # original, digest not in the archive -> untouched
        ("http://a/3", big, "d2", False),
        # under the size threshold -> exempt even though archived
        ("http://a/4", b"y" * 10, "d3", False),
        # no digest at all -> never eligible
        ("http://a/5", big, None, False),
    ]
    ok = spark.createDataFrame(
        rows, "url string, bytes binary, payload_digest string, revisit boolean"
    )
    arc = _archive(spark, [
        # two archived captures of d1: the EARLIEST (ts, url) wins,
        # like the CDX server's first-capture answer
        ("sha256:d1", "20250301102030", "http://old/first"),
        ("sha256:d1", "20260101000000", "http://old/later"),
        ("sha256:d3", "20250301102030", "http://old/small"),
    ])
    out = {r.url: r for r in mark_cdx_revisits(ok, arc, min_size=1024).collect()}

    r1 = out["http://a/1"]
    assert r1.revisit
    assert r1.refers_to_url == "http://old/first"
    assert r1.refers_to_date == "2025-03-01T10:20:30Z"
    assert r1.bytes is None  # revisit rows carry no payload

    r2 = out["http://a/2"]
    assert r2.revisit
    assert r2.refers_to_url is None and r2.refers_to_date is None

    assert not out["http://a/3"].revisit
    assert out["http://a/3"].bytes is not None
    assert not out["http://a/4"].revisit  # size-exempt
    assert not out["http://a/5"].revisit

    # idempotent: a second pass re-marks nothing (round 1's CDX revisit
    # is now a local revisit and precedence excludes it)
    again = mark_cdx_revisits(
        spark.createDataFrame(list(out.values())), arc, min_size=1024
    ).collect()
    assert {r.url: (r.revisit, r.refers_to_url) for r in again} == {
        r.url: (r.revisit, r.refers_to_url) for r in out.values()
    }


def test_mark_cdx_revisits_filters_record_type(spark):
    """An index frame that still carries record_type (cdxj_index output)
    only dedupes against response/revisit captures — a stray row of
    another type never becomes a refers-to target."""
    ok = spark.createDataFrame(
        [("http://a/1", b"x" * 2000, "d1", False)],
        "url string, bytes binary, payload_digest string, revisit boolean",
    )
    arc = spark.createDataFrame(
        [("sha256:d1", "20250101000000", "http://old/req", "request"),
         ("sha256:d1", "20260101000000", "http://old/resp", "response")],
        "digest string, ts string, url string, record_type string",
    )
    [r] = mark_cdx_revisits(ok, arc, min_size=1024).collect()
    assert r.revisit and r.refers_to_url == "http://old/resp"


def test_refers_to_prefers_payload_carrying_captures(spark):
    """A merged multi-crawl index can hold digest-only REVISIT captures
    of the same payload; the refers-to target must be a record replay
    can actually serve, even when a revisit capture is earlier."""
    ok = spark.createDataFrame(
        [("http://a/1", b"x" * 2000, "d1", False)],
        "url string, bytes binary, payload_digest string, revisit boolean",
    )
    arc = spark.createDataFrame(
        [("sha256:d1", "20240101000000", "http://old/rev", C.MIME_REVISIT),
         ("sha256:d1", "20250101000000", "http://old/resp", "image/png")],
        "digest string, ts string, url string, mime string",
    )
    [r] = mark_cdx_revisits(ok, arc, min_size=1024).collect()
    assert r.revisit and r.refers_to_url == "http://old/resp"
    assert r.refers_to_date == "2025-01-01T00:00:00Z"


# ---------------------------------------------------------------------------
# WARC header roundtrip
# ---------------------------------------------------------------------------

def test_refers_to_headers_roundtrip_through_warc(spark, tmp_path):
    out_dir = str(tmp_path / "warc")
    rows = [
        # CDX revisit: refers-to names the prior archive's capture
        ("http://h/1", 200, "im1", None, 8, 8, "png", "cap one", 7,
         0, "d1", True, "http://old/orig", "2025-03-01T10:20:30Z"),
        # in-crawl revisit: no refers-to headers on the record
        ("http://h/2", 200, "im2", None, 8, 8, "png", "cap two", 8,
         0, "d1", True, None, None),
        # original response record
        ("http://h/3", 200, "im3", b"PNGBYTES", 8, 8, "png", "cap 3", 9,
         0, "d3", False, None, None),
    ]
    cols = ("url string, status int, image_id string, bytes binary, "
            "w int, h int, fmt string, caption string, phash long, "
            "round int, payload_digest string, revisit boolean, "
            "refers_to_url string, refers_to_date string")
    W.write_warc(spark.createDataFrame(rows, cols), out_dir,
                 include_requests=False)

    # raw records: headers present exactly where they should be
    recs = {}
    import glob
    import gzip
    for f in glob.glob(out_dir + "/*.warc.gz"):
        for rec in W.parse_warc_stream(gzip.decompress(open(f, "rb").read())):
            if rec["type"] in ("response", "revisit"):
                recs[rec["headers"]["WARC-Target-URI"]] = rec
    h1 = recs["http://h/1"]["headers"]
    assert h1["WARC-Refers-To-Target-URI"] == "http://old/orig"
    assert h1["WARC-Refers-To-Date"] == "2025-03-01T10:20:30Z"
    assert recs["http://h/1"]["type"] == "revisit"
    assert "WARC-Refers-To-Target-URI" not in recs["http://h/2"]["headers"]
    assert "WARC-Refers-To-Target-URI" not in recs["http://h/3"]["headers"]

    # ingestion surfaces them as columns again
    back = {r.url: r for r in W.read_warc(spark, out_dir).collect()}
    assert back["http://h/1"].refers_to_url == "http://old/orig"
    assert back["http://h/1"].refers_to_date == "2025-03-01T10:20:30Z"
    assert back["http://h/2"].refers_to_url is None
    assert back["http://h/3"].refers_to_url is None


# ---------------------------------------------------------------------------
# cross-crawl e2e: crawl 1 -> WARC -> CDXJ -> crawl 2 dedupes against it
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cdx_corpus(spark):
    pages_meta, links, seeds = build_metadata(n_pages=70, n_hosts=6, seed=42)
    dfs = {
        "pages": fixtures.attach_payloads(spark, pages_meta).cache(),
        "links": spark.createDataFrame(links),
        "seeds": spark.createDataFrame(seeds),
    }
    dfs["pages"].count()
    return dfs


def _run(spark, wh, dfs, cfg):
    job = CrawlJob(spark, wh, dfs["pages"], dfs["links"], cfg)
    job.run(seeds=dfs["seeds"], max_rounds=cfg.max_rounds)
    return job


def test_cross_crawl_cdx_dedupe_e2e(spark, cdx_corpus, tmp_path):
    cfg = CrawlConfig(max_hops=2, per_host_budget=8, max_rounds=6,
                      payload_dedupe_min_size=64)

    # crawl 1: archive + index (the "prior crawl" whose CDX server the
    # reference would query)
    job1 = _run(spark, str(tmp_path / "wh1"), cdx_corpus, cfg)
    warc_dir = str(tmp_path / "warc1")
    W.write_warc(job1.fetched.read(), warc_dir)
    cdx_dir = str(tmp_path / "cdx1")
    C.write_cdxj(C.cdxj_index(spark, warc_dir), cdx_dir)
    archived = {
        r.d for r in C.read_cdxj(spark, cdx_dir)
        .select(F.regexp_replace("digest", "^sha256:", "").alias("d"))
        .filter(F.col("d") != "").distinct().collect()
    }
    assert archived, "crawl 1 archived no digests"

    # crawl 2 against the index, and an identical control without it
    cfg2 = CrawlConfig(max_hops=2, per_host_budget=8, max_rounds=6,
                       payload_dedupe_min_size=64,
                       cdx_dedupe_dir=cdx_dir)
    job2 = _run(spark, str(tmp_path / "wh2"), cdx_corpus, cfg2)
    ctrl = _run(spark, str(tmp_path / "wh2b"), cdx_corpus, cfg)

    got = {r.url: r for r in job2.fetched.read().collect()}
    want = {r.url: r for r in ctrl.fetched.read().collect()}

    # dedupe never changes routing: same captures, same rounds
    assert {(r.url, r.round) for r in got.values()} == {
        (r.url, r.round) for r in want.values()
    }

    n_cdx = 0
    for url, c in want.items():
        g = got[url]
        if c.revisit:
            # local tier took it first: marking unchanged, no refers-to
            assert g.revisit and g.refers_to_url is None
        elif c.payload_digest in archived:
            # an original whose payload crawl 1 archived -> CDX revisit
            assert g.revisit and g.bytes is None
            assert g.refers_to_url is not None
            assert g.refers_to_date.endswith("Z")
            n_cdx += 1
        else:
            assert not g.revisit and g.refers_to_url is None
    assert n_cdx > 0, "corpus produced no cross-crawl duplicates"

    # refers-to targets are real crawl-1 captures of the same digest
    arc = {
        (r.url, r.d)
        for r in C.read_cdxj(spark, cdx_dir)
        .select("url", F.regexp_replace("digest", "^sha256:", "").alias("d"))
        .collect()
    }
    for g in got.values():
        if g.refers_to_url is not None:
            assert (g.refers_to_url, g.payload_digest) in arc

    # the remote tier is INDEPENDENT of the local one: with
    # payload_dedupe=False (no in-crawl revisits), every archived
    # digest still dedupes against the prior crawl — never a silent
    # no-op when only cdx_dedupe_dir is set
    cfg3 = CrawlConfig(max_hops=2, per_host_budget=8, max_rounds=6,
                       payload_dedupe=False,
                       payload_dedupe_min_size=64,
                       cdx_dedupe_dir=cdx_dir)
    job3 = _run(spark, str(tmp_path / "wh3"), cdx_corpus, cfg3)
    got3 = {r.url: r for r in job3.fetched.read().collect()}
    assert {(r.url, r.round) for r in got3.values()} == {
        (r.url, r.round) for r in want.values()
    }
    n3 = 0
    for url, g in got3.items():
        if g.payload_digest in archived:
            assert g.revisit and g.refers_to_url is not None
            assert g.bytes is None
            n3 += 1
        else:
            assert not g.revisit
    assert n3 >= n_cdx
