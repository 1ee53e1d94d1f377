"""Live TUI (crawl/stats.go:15-77 analogue) + byte-lineage counters.

Covers: humanize_bytes golden values, the pure renderer's layout,
payload_bytes / deduped_bytes metrics lineage from a real crawl, and
the LiveStatsPrinter's in-place repaint loop against a real CrawlJob.
"""

from __future__ import annotations

import io

from pyspark.sql import functions as F

from zeno_spark import fixtures
from zeno_spark.config import CrawlConfig
from zeno_spark.fixtures import build_metadata
from zeno_spark.operators.tui import (
    LiveStatsPrinter,
    humanize_bytes,
    render_live_stats,
    tui_snapshot,
)
from zeno_spark.plans.crawl import CrawlJob

# payload_dedupe_min_size=64: the synthetic images are 16-64 px
# thumbnails, so the reference's 1024-byte threshold would exempt them
# and the byte-lineage test would never see a revisit (same rationale
# as tests/test_crawl.py)
CFG = CrawlConfig(
    max_hops=3, per_host_budget=16, host_salt_buckets=4,
    bloom_prefilter=True, payload_dedupe=True, payload_dedupe_min_size=64,
)


import pytest


@pytest.fixture(scope="module")
def tui_job(spark, tmp_path_factory):
    pages_meta, links, seeds = build_metadata(n_pages=120, n_hosts=8, seed=42)
    pages = fixtures.attach_payloads(spark, pages_meta)
    job = CrawlJob(
        spark, str(tmp_path_factory.mktemp("wh_tui")), pages,
        spark.createDataFrame(links), CFG,
    )
    job.run(seeds=spark.createDataFrame(seeds), max_rounds=6)
    return job


def test_humanize_bytes_golden():
    assert humanize_bytes(None) == "0 B"
    assert humanize_bytes(0) == "0 B"
    assert humanize_bytes(999) == "999 B"
    assert humanize_bytes(1000) == "1.0 kB"
    assert humanize_bytes(1536) == "1.5 kB"
    assert humanize_bytes(2_500_000) == "2.5 MB"
    assert humanize_bytes(3_200_000_000) == "3.2 GB"


def test_render_layout_pure():
    snap = {
        "rate": 123.456, "crawled": 42, "crawledSeeds": 30,
        "crawledAssets": 12, "rounds": 3, "TotalElements": 7,
        "UniqueHosts": 4, "dataWritten": 1_500_000, "dedupedLocal": 2000,
        "activeJobs": 2, "defaultParallelism": 8, "heapMb": 256,
    }
    text = render_live_stats(snap, job_name="myjob", state="running",
                             elapsed=65.0)
    lines = text.splitlines()
    assert "  - Job:" in text and "myjob" in text
    assert "  - URI/s:" in text and "123.46" in text
    assert "  - Items in queue:" in text and "7" in text
    assert "  - Data written:" in text and "1.5 MB" in text
    assert "  - Deduped (local):" in text and "2.0 kB" in text
    assert "  - Elapsed time:" in text and "1m5s" in text
    assert "  - Crawled total:" in text
    # two-column alignment: every non-blank row's value starts at the
    # same offset (uitable analogue): max key width + 2
    width = max(len(ln.split(":")[0]) + 1 for ln in lines if ":" in ln)
    for ln in lines:
        if not ln.strip():
            continue
        assert ln[width:width + 2] == "  " and ln[width + 2] != " ", ln


def test_render_surfaces_refresh_errors():
    """The crash-safe contract: a failed tui_snapshot stores an 'error'
    key, and the renderer must actually show it (stale counters with no
    indication would silently freeze the display)."""
    ok = render_live_stats({"crawled": 1})
    assert "Last refresh error" not in ok
    bad = render_live_stats({"crawled": 1, "error": "metrics read race"})
    assert "  - Last refresh error:" in bad and "metrics read race" in bad


def test_byte_lineage_and_snapshot(tui_job):
    job = tui_job
    m = job.metrics.read().agg(
        F.sum("payload_bytes").alias("w"), F.sum("deduped_bytes").alias("d")
    ).collect()[0]
    # octets written must equal the octets actually sitting in the sink
    sunk = job.fetched.read().agg(
        F.coalesce(F.sum(F.octet_length("bytes")), F.lit(0)).alias("n")
    ).collect()[0]["n"]
    assert int(m["w"]) == int(sunk) > 0
    # the corpus produces payload duplicates (test_crawl relies on it),
    # so D8 must have saved bytes — and saved octets equal the sizes of
    # the revisit rows' payloads (which the sink dropped)
    assert int(m["d"]) > 0
    snap = tui_snapshot(job, start_time=None or 0.0)
    assert snap["dataWritten"] == int(sunk)
    assert snap["dedupedLocal"] == int(m["d"])
    assert snap["crawled"] > 0
    assert snap["defaultParallelism"] >= 1


def test_live_printer_repaints_in_place(tui_job):
    job = tui_job
    buf = io.StringIO()
    p = LiveStatsPrinter(
        job, job_name="t", stream=buf,
        render_interval=0.05, refresh_interval=0.2,
    )
    with p:
        import time

        deadline = time.monotonic() + 15
        while p.frames < 3 and time.monotonic() < deadline:
            time.sleep(0.05)
    out = buf.getvalue()
    assert p.frames >= 3
    # after the first frame every repaint rewinds with cursor-up+erase
    assert "\x1b[" in out and "A\x1b[J" in out
    assert out.count("  - Job:") == p.frames
    assert "finishing" in out  # stop() paints the final state
