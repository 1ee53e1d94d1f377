"""A4 — live stats / API / Prometheus export (SURVEY §2.8).

The reference serves four endpoints from the crawl process
(crawl/api.go:34-110): `/` with rate/crawled/queued/uptime JSON,
`/metrics` with a Prometheus counter (`downloaded_uri_count_total`
labelled crawljob+host, api.go:92-110), `/queue` with queue stats, and
`/workers` with worker states.

Spark-first shape: all of these are tiny AGGREGATES over state the
engine already maintains — the per-(round, host) `metrics` table and
the frontier/claimed snapshot — so the API layer is a handful of
driver-side aggregate queries (collecting a one-row aggregate is the
correct driver-side act; no row data ever collects) plus pure
formatting functions, served by a stdlib HTTP thread.  On a cluster
the same module runs on the driver; executors are never involved
beyond the aggregate jobs.
"""

from __future__ import annotations

import json
import time
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from zeno_spark.plans.crawl import CrawlJob


def crawl_stats(job: "CrawlJob", start_time: float | None = None) -> dict:
    """The `/` payload (api.go:36-53): overall rate, crawled counts by
    seed/asset split, queued (live frontier), uptime."""
    fetched_agg = (
        job.fetched.read()
        .agg(
            F.count(F.lit(1)).alias("crawled"),
            F.sum((F.col("type") == "seed").cast("long")).alias("seeds"),
            F.sum((F.col("type") == "asset").cast("long")).alias("assets"),
        )
        .collect()[0]
    )
    rounds = job.metrics.read().agg(
        F.coalesce(F.max("round") + 1, F.lit(0)).alias("rounds"),
        F.coalesce(F.sum("scheduled"), F.lit(0)).alias("processed"),
    ).collect()[0]
    queued = job.pending_frontier().count()
    uptime = time.monotonic() - start_time if start_time is not None else None
    crawled = fetched_agg["crawled"] or 0
    return {
        "rate": round(crawled / uptime, 2) if uptime else None,
        "crawled": crawled,
        "crawledSeeds": int(fetched_agg["seeds"] or 0),
        "crawledAssets": int(fetched_agg["assets"] or 0),
        "queued": int(queued),
        "rounds": int(rounds["rounds"]),
        "frontierProcessed": int(rounds["processed"]),
        "uptime": f"{uptime:.1f}s" if uptime is not None else None,
    }


def queue_stats(job: "CrawlJob") -> dict:
    """The `/queue` payload (api.go:59-62): live frontier size plus the
    per-host spread the politeness scheduler sees."""
    agg = (
        job.pending_frontier()
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
            F.count(F.lit(1)).alias("hosts"),
            F.coalesce(F.max("n"), F.lit(0)).alias("max_host"),
        )
        .collect()[0]
    )
    return {
        "TotalElements": int(agg["total"]),
        "UniqueHosts": int(agg["hosts"]),
        "MaxHostDepth": int(agg["max_host"]),
    }


def prometheus_text(stats: dict, crawljob: str = "zeno", host: str = "local") -> str:
    """Render the Prometheus exposition the reference registers
    (api.go:92-110: `<prefix>downloaded_uri_count_total` with
    crawljob + host const labels), plus gauges for the queue and the
    seed/asset split — pure text formatting, no HTTP dependency."""
    labels = f'crawljob="{crawljob}",host="{host}"'
    lines = [
        "# HELP zeno_downloaded_uri_count_total The total number of crawled URI",
        "# TYPE zeno_downloaded_uri_count_total counter",
        f"zeno_downloaded_uri_count_total{{{labels}}} {stats['crawled']}",
        "# HELP zeno_crawled_seeds_total Crawled seed/link pages",
        "# TYPE zeno_crawled_seeds_total counter",
        f"zeno_crawled_seeds_total{{{labels}}} {stats['crawledSeeds']}",
        "# HELP zeno_crawled_assets_total Crawled asset captures",
        "# TYPE zeno_crawled_assets_total counter",
        f"zeno_crawled_assets_total{{{labels}}} {stats['crawledAssets']}",
        "# HELP zeno_queued_urls Live frontier size",
        "# TYPE zeno_queued_urls gauge",
        f"zeno_queued_urls{{{labels}}} {stats['queued']}",
    ]
    return "\n".join(lines) + "\n"


def serve_api(job: "CrawlJob", port: int = 9443, crawljob: str = "zeno"):
    """Start the API server on a daemon thread (the batch analogue of
    api.go:34-90; `/workers` is n/a — rounds have no resident worker
    pool, the closest state is the per-round metrics).  Returns the
    HTTPServer so callers can .shutdown()."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    start = time.monotonic()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API)
            try:
                if self.path == "/metrics":
                    body = prometheus_text(
                        crawl_stats(job, start), crawljob=crawljob
                    ).encode()
                    ctype = "text/plain; version=0.0.4"
                elif self.path == "/queue":
                    body = json.dumps(queue_stats(job)).encode()
                    ctype = "application/json"
                else:
                    body = json.dumps(crawl_stats(job, start)).encode()
                    ctype = "application/json"
                self.send_response(200)
            except Exception as exc:  # surface, don't kill the thread
                body = json.dumps({"error": str(exc)}).encode()
                ctype = "application/json"
                self.send_response(500)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
