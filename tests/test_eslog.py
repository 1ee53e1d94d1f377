"""Elasticsearch log sink (operators/eslog.py) against a local fake ES
server — document shape, daily index rotation, idempotent index
creation, level gate, basic auth, non-strict error counting, and the
multi-handler fan-out.  Closes the last scoped-out slice of the
reference's log package (internal/pkg/log/elasticsearch.go +
multi_handler.go); no Spark involved (the sink is driver-side by
design, like RoundLogger)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from zeno_spark.operators.eslog import EsLogHandler, TeeLogger
from zeno_spark.operators.logfile import RoundLogger


class _FakeEs(BaseHTTPRequestHandler):
    """Minimal ES surface: PUT /<index> (create, 400 already-exists on
    repeat), POST /<index>/_doc (index a document)."""

    indices: set[str] = set()
    docs: list[tuple[str, dict]] = []          # (index, doc)
    auth_seen: list[str | None] = []
    fail_docs = False                          # simulate an outage
    lock = threading.Lock()

    def _body(self):
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else {}

    def _reply(self, status, obj):
        payload = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_PUT(self):  # noqa: N802 — index create
        index = self.path.strip("/")
        with self.lock:
            self.auth_seen.append(self.headers.get("Authorization"))
            if index in self.indices:
                self._reply(400, {
                    "error": {
                        "type": "resource_already_exists_exception",
                        "reason": f"index [{index}] already exists",
                    }
                })
                return
            body = self._body()
            assert body["mappings"]["properties"]["level"] == {
                "type": "keyword"
            }
            self.indices.add(index)
        self._reply(200, {"acknowledged": True, "index": index})

    def do_POST(self):  # noqa: N802 — _doc index request
        index, _, tail = self.path.strip("/").partition("/")
        with self.lock:
            self.auth_seen.append(self.headers.get("Authorization"))
            if self.fail_docs:
                self._reply(503, {"error": "unavailable"})
                return
            assert tail == "_doc"
            assert index in self.indices
            self.docs.append((index, self._body()))
        self._reply(201, {"result": "created"})

    def log_message(self, *args):
        pass


@pytest.fixture()
def es():
    class Handler(_FakeEs):
        indices = set()
        docs = []
        auth_seen = []
        fail_docs = False

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", Handler
    srv.shutdown()


def test_document_shape_and_daily_index(es):
    url, srv = es
    t = [1_768_000_000.0]  # 2026-01-09 UTC
    h = EsLogHandler(url, index_prefix="crawl", clock=lambda: t[0])
    h.log("round_end", round=3, fetched_ok=120, host="h1.com")
    assert srv.indices == {"crawl-2026.01.09"}
    [(index, doc)] = srv.docs
    assert index == "crawl-2026.01.09"
    # elasticsearch.go:41-56 document shape
    assert doc["level"] == "INFO"
    assert doc["message"] == "round_end"
    assert doc["attrs"] == {"round": 3, "fetched_ok": 120, "host": "h1.com"}
    assert doc["timestamp"].startswith("2026-01-09T") \
        and doc["timestamp"].endswith("Z")


def test_rotation_rolls_to_new_daily_index_once(es):
    url, srv = es
    t = [1_768_000_000.0]
    h = EsLogHandler(url, index_prefix="crawl", clock=lambda: t[0])
    h.log("a")
    h.log("b")  # same day: no second create
    t[0] += 86_400  # next UTC day
    h.log("c")
    assert srv.indices == {"crawl-2026.01.09", "crawl-2026.01.10"}
    assert [i for i, _ in srv.docs] == [
        "crawl-2026.01.09", "crawl-2026.01.09", "crawl-2026.01.10"]


def test_index_create_is_idempotent_across_handlers(es):
    """Two crawls logging into the same day's index: the second
    handler's create gets resource_already_exists_exception and must
    treat it as success (elasticsearch.go:140-144)."""
    url, srv = es
    t = [1_768_000_000.0]
    EsLogHandler(url, clock=lambda: t[0]).log("a")
    h2 = EsLogHandler(url, clock=lambda: t[0])
    h2.log("b")
    assert h2.errors == 0
    assert len(srv.docs) == 2


def test_level_gate(es):
    url, srv = es
    h = EsLogHandler(url, level="warn")
    h.log("noise", level="info")
    h.log("important", level="error")
    assert [d["message"] for _, d in srv.docs] == ["important"]
    assert srv.docs[0][1]["level"] == "ERROR"


def test_basic_auth_header(es):
    url, srv = es
    EsLogHandler(url, username="elastic", password="s3cret").log("a")
    import base64
    want = "Basic " + base64.b64encode(b"elastic:s3cret").decode()
    assert set(srv.auth_seen) == {want}
    srv.auth_seen.clear()
    EsLogHandler(url).log("b")  # no creds -> no header
    assert set(srv.auth_seen) == {None}


def test_outage_counts_not_raises_and_tee_still_files(es, tmp_path):
    """A sink outage must not kill the crawl round: non-strict handler
    counts the drop, and the TeeLogger still writes the JSONL record
    (the durable surface)."""
    url, srv = es
    srv.fail_docs = True
    jsonl = RoundLogger(str(tmp_path / "crawl.jsonl"))
    eshandler = EsLogHandler(url)
    tee = TeeLogger(jsonl, eshandler)
    tee.log("round_end", round=1, fetched_ok=10)
    assert eshandler.errors == 1
    [rec] = jsonl.records()
    assert rec["event"] == "round_end" and rec["fetched_ok"] == 10
    # strict mode: the same outage raises
    with pytest.raises(RuntimeError):
        EsLogHandler(url, strict=True).log("x")


def test_unreachable_server_counts_not_raises(tmp_path):
    h = EsLogHandler("http://127.0.0.1:9", timeout=0.3)  # discard port
    h.log("a")
    h.log("b")
    assert h.errors == 2
