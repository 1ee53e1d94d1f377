"""Elasticsearch log sink + handler fan-out — the reference's
`internal/pkg/log/elasticsearch.go` and `multi_handler.go` analogues,
closing the last scoped-out slice of its 753-LoC log package.

Shape parity with the reference handler (cited lines are
elasticsearch.go):

  * document = {timestamp: RFC3339, level, message, attrs:{...}}
    (`Handle`, :41-56) — our structured fields land under ``attrs``
    exactly like slog attrs do;
  * daily index ``<prefix>-YYYY.MM.DD`` with rotate-on-roll
    (`Rotate`/`NextRotation`, :153-177) — we roll lazily on the first
    write past midnight instead of running a timer goroutine (same
    index sequence, no background thread on the driver);
  * index auto-created with the reference's exact mapping, idempotent
    on ``resource_already_exists_exception`` (`createIndex`,
    :114-149);
  * one index request per record (`esapi.IndexRequest`, :73-81) —
    deliberate parity; a bulk tier is trivial to add but the
    reference's wire behaviour is per-record;
  * level gate (`Enabled`, :93-96).

Spark-first note: like RoundLogger (logfile.py), this is DRIVER-side
only — one document per round EVENT, never per fetched row.  Executor
telemetry flows through Spark's own event log; shipping 10^10 per-row
documents at an ES cluster is write amplification, not logging.

Transport is stdlib urllib (the image has no elasticsearch client, and
the surface we need is two endpoints: PUT /<index> and
POST /<index>/_doc).  Failures are counted, not raised, unless
``strict`` — a log sink outage must not kill a crawl round (the JSONL
file handler remains the durable surface)."""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.request
from datetime import datetime, timezone

_LEVELS = {"debug": 10, "info": 20, "warn": 30, "warning": 30, "error": 40}

_INDEX_MAPPING = {
    "mappings": {
        "properties": {
            "timestamp": {"type": "date"},
            "level": {"type": "keyword"},
            "message": {"type": "text"},
            "attrs": {"type": "object", "dynamic": True},
        }
    }
}


class EsLogHandler:
    """Duck-types RoundLogger's ``log(event, level=..., **fields)`` so
    TeeLogger can fan one call to both sinks.

    ``url``: base address, e.g. ``http://127.0.0.1:9200``.
    ``index_prefix``: daily indices ``<prefix>-YYYY.MM.DD``.
    ``level``: minimum level indexed (debug|info|warn|error).
    ``username``/``password``: HTTP basic auth when both set.
    ``strict``: raise on transport/index errors instead of counting.
    ``clock``: epoch-seconds callable (tests inject to cross midnight).
    """

    def __init__(
        self,
        url: str,
        index_prefix: str = "zeno",
        level: str = "info",
        username: str = "",
        password: str = "",
        strict: bool = False,
        timeout: float = 5.0,
        clock=None,
    ):
        self.url = url.rstrip("/")
        self.index_prefix = index_prefix
        self.min_level = _LEVELS.get(level.lower(), 20)
        self.strict = strict
        self.timeout = timeout
        self._clock = clock or time.time
        self._auth = (
            base64.b64encode(f"{username}:{password}".encode()).decode()
            if username and password
            else None
        )
        self.index: str | None = None   # current daily index
        self.errors = 0                 # dropped records (non-strict)

    # -- wire ----------------------------------------------------------

    def _request(self, method: str, path: str, body: dict) -> tuple[int, str]:
        req = urllib.request.Request(
            self.url + path,
            data=json.dumps(body).encode(),
            method=method,
            headers={"Content-Type": "application/json"},
        )
        if self._auth:
            req.add_header("Authorization", f"Basic {self._auth}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode("utf-8", "replace")

    # -- index lifecycle (Rotate/createIndex parity) -------------------

    def _today_index(self) -> str:
        d = datetime.fromtimestamp(self._clock(), tz=timezone.utc)
        return f"{self.index_prefix}-{d.strftime('%Y.%m.%d')}"

    def _ensure_index(self) -> None:
        """Lazy daily roll: on the first record of a new UTC day, point
        at ``<prefix>-<today>`` and create it (idempotent — an
        already-exists answer is success, elasticsearch.go:140-144)."""
        want = self._today_index()
        if want == self.index:
            return
        status, body = self._request("PUT", f"/{want}", _INDEX_MAPPING)
        if status >= 300 and "resource_already_exists_exception" not in body:
            raise RuntimeError(f"ES index create failed ({status}): {body[:200]}")
        self.index = want

    # -- record --------------------------------------------------------

    def log(self, event: str, level: str = "info", **fields) -> None:
        if _LEVELS.get(level.lower(), 20) < self.min_level:
            return
        try:
            self._ensure_index()
            doc = {
                "timestamp": datetime.fromtimestamp(
                    self._clock(), tz=timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%SZ"),
                "level": level.upper(),
                "message": event,
                "attrs": dict(fields),
            }
            status, body = self._request(
                "POST", f"/{self.index}/_doc", doc
            )
            if status >= 300:
                raise RuntimeError(f"ES index doc failed ({status}): {body[:200]}")
        except Exception:
            if self.strict:
                raise
            self.errors += 1


class TeeLogger:
    """multi_handler.go analogue: fan one ``log`` call to every
    handler; a non-strict handler's failure never hides the others."""

    def __init__(self, *handlers):
        self.handlers = [h for h in handlers if h is not None]

    def log(self, event: str, level: str = "info", **fields) -> None:
        for h in self.handlers:
            h.log(event, level=level, **fields)
