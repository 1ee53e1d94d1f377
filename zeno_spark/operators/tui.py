"""Live terminal stats — the reference's 250 ms uilive/uitable render
loop (crawl/stats.go:15-77) rebuilt over the engine's table state.

Two layers, separable for testing:

* ``render_live_stats(snapshot) -> str`` — PURE formatting: the same
  two-column table the reference prints (job, state, workers, URI/s,
  queue totals, crawled split, data written, dedupe savings, elapsed,
  heap), golden-testable without a terminal.
* ``LiveStatsPrinter`` — the uilive analogue: a daemon thread that
  repaints in place (ANSI cursor-up + erase) every ``render_interval``
  (default 250 ms, stats.go:76).  The reference reads in-memory atomics
  each frame; our counters are tiny AGGREGATE QUERIES over the metrics
  table and the live frontier, so the snapshot refreshes on a separate,
  slower cadence (``refresh_interval``, default 2 s) while the
  wall-clock row ticks every frame — repainting at 4 Hz but querying
  Spark at 0.5 Hz keeps the render loop from competing with the crawl
  for task slots (the divergence a driver-side render loop must make
  when its counters live in tables instead of process memory).

Byte counters come from the metrics table's payload_bytes /
deduped_bytes lineage columns (operators/fetch.py measures
payload_size once, in the verify scan) — the renderer never scans
binary payload columns.
"""

from __future__ import annotations

import sys
import threading
import time
from typing import TYPE_CHECKING, Callable

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from zeno_spark.plans.crawl import CrawlJob


def humanize_bytes(n: int | None) -> str:
    """Decimal byte units like the reference's go-humanize
    (humanize.Bytes: 1000-based, one decimal, 'kB/MB/GB')."""
    if n is None:
        return "0 B"
    n = int(n)
    if n < 1000:
        return f"{n} B"
    units = ["kB", "MB", "GB", "TB", "PB", "EB"]
    v = float(n)
    for u in units:
        v /= 1000.0
        if v < 1000.0:
            return f"{v:.1f} {u}"
    return f"{v:.1f} {units[-1]}"


def _fmt_elapsed(seconds: float) -> str:
    """Go duration-ish rendering (1h2m3s)."""
    s = int(seconds)
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    if h:
        return f"{h}h{m}m{s}s"
    if m:
        return f"{m}m{s}s"
    return f"{seconds:.1f}s"


def tui_snapshot(job: "CrawlJob", start_time: float) -> dict:
    """One frame's worth of counters: the aggregate analogues of the
    atomics stats.go reads (CrawledSeeds/CrawledAssets, URIsPerSecond,
    Queue.GetStats, warc.DataTotal, LocalDedupeTotal) plus driver-JVM
    heap and active-job gauges standing in for the heap/goroutine rows.
    Three tiny aggregate jobs; no payload column is ever scanned."""
    from zeno_spark.operators.stats import crawl_stats, queue_stats

    snap = crawl_stats(job, start_time)
    snap.update(queue_stats(job))
    byte_row = (
        job.metrics.read()
        .agg(
            F.coalesce(F.sum("payload_bytes"), F.lit(0)).alias("written"),
            F.coalesce(F.sum("deduped_bytes"), F.lit(0)).alias("deduped"),
        )
        .collect()[0]
    )
    snap["dataWritten"] = int(byte_row["written"])
    snap["dedupedLocal"] = int(byte_row["deduped"])
    sc = job.spark.sparkContext
    tracker = sc.statusTracker()
    snap["activeJobs"] = len(tracker.getActiveJobsIds())
    snap["defaultParallelism"] = sc.defaultParallelism
    try:  # driver-JVM heap (the bToMb(m.Alloc) row)
        rt = sc._jvm.java.lang.Runtime.getRuntime()
        snap["heapMb"] = int((rt.totalMemory() - rt.freeMemory()) / 1024 / 1024)
    except Exception:  # pragma: no cover - connect-mode / mocked sc
        snap["heapMb"] = None
    return snap


def render_live_stats(
    snapshot: dict,
    job_name: str = "zeno",
    state: str = "running",
    elapsed: float | None = None,
) -> str:
    """The uitable layout of stats.go:36-73, row for row (rows whose
    backing feature is off — handover, HQ, CDX — are omitted exactly
    like the reference's conditionals)."""
    rate = snapshot.get("rate")
    rows = [
        ("", ""),
        ("  - Job:", job_name),
        ("  - State:", state),
        (
            "  - Active workers:",
            f"{snapshot.get('activeJobs', 0)}"
            f"/{snapshot.get('defaultParallelism', 0)}",
        ),
        ("  - URI/s:", f"{rate:.2f}" if rate is not None else "-"),
        ("  - Items in queue:", str(snapshot.get("TotalElements", 0))),
        ("  - Hosts in queue:", str(snapshot.get("UniqueHosts", 0))),
        ("  - Queue empty bool state:",
         str(snapshot.get("TotalElements", 0) == 0).lower()),
        ("  - Rounds committed:", str(snapshot.get("rounds", 0))),
        ("  - Crawled total:", str(snapshot.get("crawled", 0))),
        ("  - Crawled seeds:", str(snapshot.get("crawledSeeds", 0))),
        ("  - Crawled assets:", str(snapshot.get("crawledAssets", 0))),
        ("  - Data written:", humanize_bytes(snapshot.get("dataWritten"))),
        ("  - Deduped (local):", humanize_bytes(snapshot.get("dedupedLocal"))),
        ("", ""),
        (
            "  - Elapsed time:",
            _fmt_elapsed(elapsed) if elapsed is not None else "-",
        ),
        (
            "  - Allocated (heap):",
            f"{snapshot['heapMb']} MiB"
            if snapshot.get("heapMb") is not None else "-",
        ),
        ("  - Active Spark jobs:", str(snapshot.get("activeJobs", 0))),
        ("", ""),
    ]
    if snapshot.get("error"):
        # a failed refresh must be VISIBLE: the counters above are stale
        # until a snapshot succeeds again (crash-safe render contract)
        rows.insert(-1, ("  - Last refresh error:", snapshot["error"]))
    width = max(len(k) for k, _ in rows)
    return "\n".join(
        (f"{k:<{width}}  {v}".rstrip()) for k, v in rows
    ) + "\n"


class LiveStatsPrinter:
    """uilive analogue: repaint the stats block in place on a daemon
    thread.  ``start()`` before ``job.run(...)``, ``stop()`` after (or
    use as a context manager).  Crash-safe: a failed snapshot renders
    an error row instead of killing the thread."""

    def __init__(
        self,
        job: "CrawlJob",
        job_name: str = "zeno",
        stream=None,
        render_interval: float = 0.25,
        refresh_interval: float = 2.0,
        state_fn: Callable[[], str] | None = None,
    ) -> None:
        self.job = job
        self.job_name = job_name
        self.stream = stream if stream is not None else sys.stdout
        self.render_interval = render_interval
        self.refresh_interval = refresh_interval
        self.state_fn = state_fn or (lambda: "running")
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last_lines = 0
        self._snapshot: dict = {}
        self._snapshot_at = 0.0
        self._start_time = 0.0
        self.frames = 0  # test observability

    # -- lifecycle ---------------------------------------------------
    def start(self) -> "LiveStatsPrinter":
        self._start_time = time.monotonic()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self._paint(final=True)

    def __enter__(self) -> "LiveStatsPrinter":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- internals ---------------------------------------------------
    def _refresh(self) -> None:
        try:
            self._snapshot = tui_snapshot(self.job, self._start_time)
        except Exception as exc:  # keep painting through round commits
            self._snapshot = dict(self._snapshot, error=str(exc)[:60])
        self._snapshot_at = time.monotonic()

    def _paint(self, final: bool = False) -> None:
        text = render_live_stats(
            self._snapshot,
            job_name=self.job_name,
            state="finishing" if final else self.state_fn(),
            elapsed=time.monotonic() - self._start_time,
        )
        lines = text.count("\n")
        out = ""
        if self._last_lines:
            out += f"\x1b[{self._last_lines}A\x1b[J"  # cursor up + erase
        out += text
        self.stream.write(out)
        self.stream.flush()
        self._last_lines = lines
        self.frames += 1

    def _loop(self) -> None:
        # first frame paints immediately (empty counters) — the refresh
        # is an aggregate QUERY, not an atomic read, so it must never
        # delay the first paint
        while not self._stop.is_set():
            self._paint()
            if time.monotonic() - self._snapshot_at >= self.refresh_interval:
                self._refresh()
            self._stop.wait(self.render_interval)
