"""robots.txt parsing + gating (F10 — north-rule addition; the
reference has NO robots handling, grep robots -> 0 hits).

Two pieces:

  * parse_robots_txt / robots_table_from_bodies — parse fetched
    robots.txt bodies into the ``robots`` table (host,
    disallow_prefixes, crawl_delay), Arrow-batched;
  * the gate itself lives in operators/admission.py
    (apply_robots_gate): broadcast-join on host + native array `exists`
    prefix match — the robots cache is tiny next to the frontier.

Parser semantics (conservative subset of REP / RFC 9309):
  * only User-agent: * groups apply (we crawl as a generic agent);
  * Disallow: <prefix> collects prefixes; empty Disallow means
    allow-all (contributes nothing);
  * Allow: lines are NOT evaluated (prefix-disallow only) — a
    conservative over-block, the safe direction for politeness;
  * Crawl-delay: first parseable value wins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from zeno_spark import schemas


def parse_robots_txt(body: str) -> tuple[list[str], float | None]:
    """-> (disallow_prefixes, crawl_delay) for User-agent: *."""
    prefixes: list[str] = []
    delay: float | None = None
    applies = False        # the current group names User-agent: *
    in_agent_block = False  # consecutive User-agent lines open a group
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_block:
                applies = False  # a fresh group resets applicability
            in_agent_block = True
            if value == "*":
                applies = True
        else:
            in_agent_block = False
            if key == "disallow" and applies and value:
                prefixes.append(value)
            elif key == "crawl-delay" and applies and delay is None:
                try:
                    delay = float(value)
                except ValueError:
                    pass
    return prefixes, delay


def robots_table_from_bodies(bodies: DataFrame) -> DataFrame:
    """(host, body) -> robots table rows, one mapInPandas pass."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                prefixes, delay = parse_robots_txt(body or "")
                rows.append(
                    {"host": host, "disallow_prefixes": prefixes,
                     "crawl_delay": delay}
                )
            yield pd.DataFrame(
                rows, columns=["host", "disallow_prefixes", "crawl_delay"]
            )

    return bodies.select("host", "body").mapInPandas(
        _parse, schema=schemas.ROBOTS
    )
