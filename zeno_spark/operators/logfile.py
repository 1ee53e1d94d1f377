"""Structured per-round crawl log — the reference's log package analogue
(internal/pkg/log/log.go: leveled fields-first logger; rotate.go: size-
rotated file handler; multi.go: fan-out to several handlers).  The
Elasticsearch sink (elasticsearch.go) is explicitly out of scope in this
sandbox — the JSONL file is the durable surface a log shipper tails.

Design notes (Spark-first):
  * Records are DRIVER-side only: one JSONL line per round event
    (round_start, stage timings, round_end with the counter block,
    lifecycle events).  Executors never log here — per-task telemetry
    already flows through Spark's own event log; duplicating it per row
    would be a 10^10-row write amplification, not a log.
  * Rotation is size-based with a bounded backup chain
    (crawl.jsonl -> crawl.jsonl.1 -> ... -> .{keep}), like rotate.go's
    rotating file handler, so a years-long crawl's log footprint is
    O(max_bytes * keep), constant.
  * Every record carries ts (epoch seconds), event, and level; payload
    fields are flat JSON scalars so `duckdb: read_json_auto` or jq can
    aggregate them without schema wrangling.
"""

from __future__ import annotations

import json
import os
import time


class RoundLogger:
    """Append-only JSONL logger with size rotation.

    ``max_bytes``: rotate when the live file would exceed this.
    ``keep``: number of rotated backups retained (older ones deleted).
    A ``keep`` of 0 still rotates (truncates) — the live file alone is
    bounded either way.
    """

    def __init__(
        self,
        path: str,
        max_bytes: int = 16 * 1024 * 1024,
        keep: int = 4,
        clock=None,
    ):
        self.path = path
        self.max_bytes = max_bytes
        self.keep = keep
        self._clock = clock or time.time
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    # -- rotation ------------------------------------------------------

    def _rotate(self) -> None:
        """crawl.jsonl.{keep-1} -> .{keep}, ..., live -> .1 (rotate.go's
        shift; the oldest backup falls off the end)."""
        oldest = f"{self.path}.{self.keep}"
        if self.keep and os.path.exists(oldest):
            os.remove(oldest)
        for i in range(self.keep - 1, 0, -1):
            src = f"{self.path}.{i}"
            if os.path.exists(src):
                os.rename(src, f"{self.path}.{i + 1}")
        if os.path.exists(self.path):
            if self.keep:
                os.rename(self.path, f"{self.path}.1")
            else:
                os.remove(self.path)

    # -- write ---------------------------------------------------------

    def log(self, event: str, level: str = "info", **fields) -> None:
        rec = {"ts": round(self._clock(), 3), "level": level, "event": event}
        rec.update(fields)
        line = json.dumps(rec, sort_keys=True) + "\n"
        try:
            size = os.path.getsize(self.path)
        except OSError:
            size = 0
        if size and size + len(line) > self.max_bytes:
            self._rotate()
        with open(self.path, "a") as fh:
            fh.write(line)

    # -- read-back (tests / TUI tail) -----------------------------------

    def records(self, include_rotated: bool = False) -> list[dict]:
        paths = []
        if include_rotated:
            paths.extend(
                f"{self.path}.{i}"
                for i in range(self.keep, 0, -1)
                if os.path.exists(f"{self.path}.{i}")
            )
        if os.path.exists(self.path):
            paths.append(self.path)
        out: list[dict] = []
        for p in paths:
            with open(p) as fh:
                out.extend(json.loads(ln) for ln in fh if ln.strip())
        return out


class StageTimer:
    """Context-manager stopwatch feeding a RoundLogger record dict:
    ``with timer.stage("fetch"): ...`` accumulates {"t_fetch": sec}.
    Pure driver-side wall clock — the stages it brackets are Spark
    actions, so the numbers ARE the per-stage round latency the log's
    consumers (and the bench profile) want."""

    def __init__(self, clock=None):
        self._clock = clock or time.monotonic
        self.timings: dict[str, float] = {}

    def stage(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = timer._clock()
                return self

            def __exit__(self, *exc):
                timer.timings[f"t_{name}"] = round(
                    timer.timings.get(f"t_{name}", 0.0)
                    + (timer._clock() - self.t0),
                    4,
                )
                return False

        return _Ctx()
