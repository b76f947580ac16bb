"""Sink transport: token cache, bearer POST, per-partition delivery
against a REAL local HTTP server (reference app.py:357-368, 1351-1414)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from coa_ocr_simple_spark.operators.sink_payload import alchemy_payload
from coa_ocr_simple_spark.operators.sink_transport import (
    HttpPostTransport,
    TokenCache,
    deliver_payloads,
    json_token_fetcher,
)


# --- TokenCache unit semantics (app.py:357-368) -----------------------------------------


def test_token_cache_fetch_reuse_expire_invalidate():
    clock = {"t": 1000.0}
    issued = []

    def fetch():
        issued.append(len(issued))
        return f"tok-{len(issued)}", 120.0

    cache = TokenCache(fetch, safety_seconds=20.0, clock=lambda: clock["t"])
    assert cache.get() == "tok-1"
    assert cache.get() == "tok-1"  # reused, no refetch
    assert cache.fetch_count == 1
    clock["t"] += 99.0  # still inside expiry - safety
    assert cache.get() == "tok-1"
    clock["t"] += 2.0  # past the safety margin
    assert cache.get() == "tok-2"
    cache.invalidate()
    assert cache.get() == "tok-3"
    assert cache.fetch_count == 3


# --- a real HTTP sink -------------------------------------------------------------------


class _SinkState:
    def __init__(self, token_lifetime_posts=10**9, fail_first=False):
        self.lock = threading.Lock()
        self.tokens_issued = 0
        self.valid_tokens: set[str] = set()
        self.posts_per_token: dict[str, int] = {}
        self.token_lifetime_posts = token_lifetime_posts
        self.fail_first = fail_first
        self.failed_once: set[str] = set()
        self.received: list[dict] = []


def _make_server(state: _SinkState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n)
            if self.path == "/token":
                with state.lock:
                    state.tokens_issued += 1
                    tok = f"tok-{state.tokens_issued}"
                    state.valid_tokens.add(tok)
                    state.posts_per_token[tok] = 0
                out = json.dumps({"access_token": tok, "expires_in": 3600})
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(out.encode())
                return
            auth = self.headers.get("Authorization", "")
            tok = auth.removeprefix("Bearer ")
            payload = json.loads(body)
            with state.lock:
                if tok not in state.valid_tokens:
                    self.send_response(401)
                    self.end_headers()
                    return
                state.posts_per_token[tok] += 1
                if state.posts_per_token[tok] > state.token_lifetime_posts:
                    state.valid_tokens.discard(tok)  # server-side expiry
                    self.send_response(401)
                    self.end_headers()
                    return
                doc = payload.get("_doc_id", "")
                if state.fail_first and doc not in state.failed_once:
                    state.failed_once.add(doc)
                    self.send_response(503)
                    self.end_headers()
                    return
                state.received.append(payload)
            self.send_response(200)
            self.end_headers()

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


@pytest.fixture()
def extracted_df(spark):
    rows = [
        ("doc-%03d" % i, {"product_name": f"P{i}", "cas_number": f"64-17-{i % 10}",
                          "purity": "99%", "lot_number": f"L-{i}"})
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id string, entities map<string,string>")


def _factory(base: str):
    def make() -> HttpPostTransport:
        return HttpPostTransport(
            f"{base}/records",
            TokenCache(json_token_fetcher(f"{base}/token")),
            backoff_seconds=0.01,
        )

    return make


def _tagged_payloads(extracted_df):
    """payload_json with the doc_id tagged in, so the server can key on it."""
    from pyspark.sql import functions as F

    p = alchemy_payload(extracted_df)
    tagged = F.to_json(F.struct(F.col("doc_id").alias("_doc_id"), F.col("payload").alias("payload")))
    return p.select("doc_id", tagged.alias("payload_json"))


def test_delivery_report_all_ok_and_one_token_per_partition(spark, extracted_df):
    state = _SinkState()
    server, base = _make_server(state)
    try:
        payloads = _tagged_payloads(extracted_df).repartition(4)
        report = deliver_payloads(payloads, _factory(base)).collect()
        assert len(report) == 20
        assert all(r["ok"] and r["status"] == 200 for r in report)
        assert len(state.received) == 20
        # payload shape reached the wire (app.py:1351-1414)
        sample = state.received[0]["payload"]
        idents = [p["identifier"] for p in sample["properties"]]
        assert idents == ["RecordName", "CasNumber", "Purity", "LotNumber"]
        # one token per PARTITION, not per document
        assert 1 <= state.tokens_issued <= 4
    finally:
        server.shutdown()


def test_stale_token_refresh_mid_stream(spark, extracted_df):
    state = _SinkState(token_lifetime_posts=3)  # server kills tokens after 3 posts
    server, base = _make_server(state)
    try:
        payloads = _tagged_payloads(extracted_df).repartition(1)
        report = deliver_payloads(payloads, _factory(base)).collect()
        assert all(r["ok"] for r in report)
        assert len(state.received) == 20
        assert state.tokens_issued >= 6  # 20 posts / 3-post lifetime
    finally:
        server.shutdown()


def test_5xx_retry_delivers_everything(spark, extracted_df):
    state = _SinkState(fail_first=True)  # first attempt per doc -> 503
    server, base = _make_server(state)
    try:
        payloads = _tagged_payloads(extracted_df).repartition(2)
        report = deliver_payloads(payloads, _factory(base)).collect()
        assert all(r["ok"] for r in report)
        assert len(state.received) == 20
    finally:
        server.shutdown()
