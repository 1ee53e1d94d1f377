"""WET/WAT derived formats (operators/wetwat.py): text extraction,
record selection (originals-with-text only for WET, every capture for
WAT), the WARC-Refers-To cross-link contract into the write_warc
archive of the same rows, envelope determinism, and reader roundtrips."""

from __future__ import annotations

import glob
import gzip
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeno_spark.operators import wetwat as ww
from zeno_spark.operators.warc import parse_warc_stream, write_warc

SINK_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("round", T.IntegerType()),
    T.StructField("payload_digest", T.StringType()),
    T.StructField("revisit", T.BooleanType()),
    T.StructField("refers_to_url", T.StringType()),
    T.StructField("refers_to_date", T.StringType()),
])

ROWS = [
    # two image originals, one HTML original, one revisit, one 404
    ("http://a.com/1", 200, "img1", b"\x89PNGfake", 4, 4, "png",
     "a red square", 7, 1, "d1", False, None, None),
    ("http://b.com/2", 200, "img2", b"\x89PNGfake2", 8, 8, "png",
     "  a blue circle ", 9, 2, "d2", False, None, None),
    ("http://c.com/p", 200, None,
     b"<html><script>x()</script><p>Hello &amp; welcome</p></html>",
     None, None, None, None, None, 1, "d3", False, None, None),
    ("http://a.com/dup", 200, "img1", None, 4, 4, "png",
     "a red square", 7, 2, "d1", True, "http://a.com/1",
     "2026-01-01T00:01:00Z"),
    ("http://gone.com/x", 404, None, b"", None, None, None, None,
     None, 1, None, False, None, None),
]

FRONTIER = [
    ("http://b.com/2", "http://a.com/1"),
    ("http://c.com/p", "http://a.com/1"),
    ("http://b.com/2", "http://a.com/1"),   # dup outlink: must dedupe
    ("http://a.com/1", None),               # seed
]


@pytest.fixture()
def fetched(spark):
    return spark.createDataFrame(ROWS, SINK_SCHEMA)


def _records(path_glob, rec_type):
    out = []
    for path in sorted(glob.glob(path_glob)):
        with open(path, "rb") as fh:
            for rec in parse_warc_stream(fh.read()):
                if rec["type"] == rec_type:
                    out.append(rec)
    return out


def test_html_to_text_strips_markup():
    assert ww.html_to_text(
        b"<html><style>p{}</style><script>x()</script>"
        b"<p>Hello &amp;\n  <b>world</b></p></html>"
    ) == "Hello & world"
    assert ww.html_to_text(b"") == ""
    assert ww.html_to_text(b"\xff\xfe<p>ok</p>") .endswith("ok")


def test_wet_selects_originals_with_text(spark, fetched, tmp_path):
    out = str(tmp_path / "wet")
    manifest = ww.write_wet(fetched, out, rotate_bytes=1 << 20)
    assert manifest.agg(F.sum("records")).collect()[0][0] >= 3
    got = {r["url"]: r["text"]
           for r in ww.read_wet(spark, out).collect()}
    # image captions verbatim (stripped), HTML tag-stripped; the
    # revisit and the 404 emit nothing
    assert got == {
        "http://a.com/1": "a red square",
        "http://b.com/2": "a blue circle",
        "http://c.com/p": "Hello & welcome",
    }


def test_wet_refers_to_links_into_archive(spark, fetched, tmp_path):
    arc, wet = str(tmp_path / "arc"), str(tmp_path / "wet")
    write_warc(fetched, arc, rotate_bytes=1 << 20)
    ww.write_wet(fetched, wet, rotate_bytes=1 << 20)
    resp_ids = {
        r["headers"]["WARC-Record-ID"]
        for r in _records(f"{arc}/*.warc.gz", "response")
    }
    wet_refs = {
        r["headers"]["WARC-Refers-To"]
        for r in _records(f"{wet}/*.warc.gz", "conversion")
    }
    assert wet_refs and wet_refs <= resp_ids


def test_wat_envelopes_every_capture(spark, fetched, tmp_path):
    out = str(tmp_path / "wat")
    discovered = spark.createDataFrame(
        FRONTIER, "url string, parent_url string")
    ww.write_wat(fetched, out, discovered=discovered,
                 rotate_bytes=1 << 20)
    recs = {r["headers"]["WARC-Target-URI"]: json.loads(r["block"])
            for r in _records(f"{out}/*.warc.gz", "metadata")}
    assert set(recs) == {r[0] for r in ROWS}  # all five, incl. revisit/404
    env = recs["http://a.com/1"]["Envelope"]
    assert env["Payload-Metadata"]["Image-Metadata"] == {
        "Width": 4, "Height": 4}
    assert [l["url"] for l in env["Payload-Metadata"]["Links"]] == [
        "http://b.com/2", "http://c.com/p"]  # sorted, deduped
    rev = recs["http://a.com/dup"]["Envelope"]["WARC-Header-Metadata"]
    assert rev["WARC-Type"] == "revisit"
    assert rev["WARC-Refers-To-Target-URI"] == "http://a.com/1"


def test_wat_refers_to_links_into_archive(spark, fetched, tmp_path):
    arc, wat = str(tmp_path / "arc"), str(tmp_path / "wat")
    write_warc(fetched, arc, rotate_bytes=1 << 20)
    ww.write_wat(fetched, wat, rotate_bytes=1 << 20)
    src_ids = {
        r["headers"]["WARC-Record-ID"]
        for t in ("response", "revisit")
        for r in _records(f"{arc}/*.warc.gz", t)
    }
    wat_refs = {
        r["headers"]["WARC-Refers-To"]
        for r in _records(f"{wat}/*.warc.gz", "metadata")
    }
    assert wat_refs and wat_refs <= src_ids


def test_wet_records_are_deterministic(spark, fetched, tmp_path):
    """Two exports of the same rows produce identical record streams
    (ids, dates, digests, blocks) — filenames/warcinfo aside, which
    carry the task-attempt series name."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ww.write_wet(fetched.repartition(3), a, rotate_bytes=1 << 20)
    ww.write_wet(fetched.coalesce(1), b, rotate_bytes=1 << 20)

    def key(recs):
        return sorted(
            (r["headers"]["WARC-Record-ID"], r["headers"]["WARC-Date"],
             r["headers"].get("WARC-Payload-Digest"), r["block"])
            for r in recs
        )

    assert key(_records(f"{a}/*.warc.gz", "conversion")) == key(
        _records(f"{b}/*.warc.gz", "conversion"))


def test_wet_gzip_members_parse_individually(fetched, spark, tmp_path):
    """One gzip member per record: standard readers can seek."""
    out = str(tmp_path / "wet")
    ww.write_wet(fetched, out, rotate_bytes=1 << 20)
    for path in glob.glob(f"{out}/*.warc.gz"):
        with open(path, "rb") as fh:
            raw = fh.read()
        # whole-file decompress handles concatenated members
        assert gzip.decompress(raw).startswith(b"WARC/1.1")


def test_wet_corpus_feeds_the_datapipe_text_tier(spark, fetched, tmp_path):
    """The loop the derived formats exist for: archive -> WET text
    corpus -> datapipe analysis, with no access to the original
    crawl's tables."""
    from pyspark.sql import functions as F

    from zeno_spark.datapipe.text import token_stats

    out = str(tmp_path / "wet")
    ww.write_wet(fetched, out, rotate_bytes=1 << 20)
    docs = ww.read_wet(spark, out).select(
        F.col("url").alias("doc_id"), "text"
    )
    stats = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    assert stats["http://a.com/1"] == 3      # "a red square"
    assert stats["http://c.com/p"] == 3      # "Hello & welcome"


def test_archive_sweep_spares_derived_staging_names():
    """ADVICE r4 low #2: write_warc's loser sweep must be scoped to its
    own zeno-<8 digit tid>- series so a concurrent WET/WAT export
    staging into the same directory never loses in-flight files."""
    from zeno_spark.operators.warc import OPEN_SUFFIX, _is_own_stage_loser

    assert _is_own_stage_loser("zeno-00000003-00000.warc.gz" + OPEN_SUFFIX)
    # derived sinks' staging series: NOT this sweep's business
    assert not _is_own_stage_loser(
        "zeno-wet-00000003-00000.warc.gz" + OPEN_SUFFIX)
    assert not _is_own_stage_loser(
        "zeno-wat-00000003-00000.warc.gz" + OPEN_SUFFIX)
    # live-capture series and published (committed) files untouched
    assert not _is_own_stage_loser("live-00000003-00000.warc.gz"
                                   + OPEN_SUFFIX)
    assert not _is_own_stage_loser("zeno-00000003-00000.warc.gz")


def test_read_wet_glob_reads_externally_named_corpora(spark, fetched,
                                                      tmp_path):
    """ADVICE r4 low #3: the reader's default glob selects only this
    sink's files; an explicit glob reads a Common Crawl-named corpus
    (*.warc.wet.gz) with the same record parser."""
    import os

    out = str(tmp_path / "wet")
    ww.write_wet(fetched, out, rotate_bytes=1 << 20)
    for i, path in enumerate(sorted(glob.glob(f"{out}/zeno-wet-*.warc.gz"))):
        os.rename(path, f"{out}/CC-MAIN-fake-{i:05d}.warc.wet.gz")
    # default glob now sees nothing; the explicit glob sees the corpus
    assert ww.read_wet(spark, out).count() == 0
    got = {r["url"]: r["text"]
           for r in ww.read_wet(spark, out,
                                glob="*.warc.wet.gz").collect()}
    assert got["http://a.com/1"] == "a red square"
    assert got["http://c.com/p"] == "Hello & welcome"
