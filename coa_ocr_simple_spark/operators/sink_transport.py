"""Sink transport — the actual delivery leg of S7 (SURVEY §2.1).

The reference POSTs each payload to the Alchemy API with a cached bearer
token (/root/reference/app.py:1351-1414; token cache semantics
app.py:357-368: fetch once, reuse until expiry, refresh when stale).
Round-1 modeled only the payload shape (sink_payload.py); this module is
the working transport:

- ``TokenCache``   — fetch-once / reuse-until-expiry / explicit
  invalidate (the reference's ``get_access_token``), clock-injectable;
- ``HttpPostTransport`` — stdlib-urllib POST with bearer auth, one
  401-triggered refresh, bounded retry with backoff on 5xx/connection
  errors (no third-party deps, so it runs on bare executors);
- ``deliver_payloads`` — the Spark leg: one transport (= one token
  fetch + one connection policy) per PARTITION via mapInPandas, emitting
  a (doc_id, status, ok) delivery report.

Scale shape at 10^12 docs: delivery is a partition-parallel side effect
whose REPORT is data — failed rows are retried by exactly the resume
anti-join pattern the extract job already uses (join the report back,
re-deliver ``ok = false``), never by rerunning the whole sink.  Tokens
are fetched once per partition, not per document.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


class TokenCache:
    """Reference get_access_token semantics (app.py:357-368): cache the
    bearer token, reuse until ``expires_in`` (minus a safety margin) has
    elapsed, refresh on demand."""

    def __init__(
        self,
        fetch: Callable[[], tuple[str, float]],
        safety_seconds: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self._fetch = fetch
        self._safety = safety_seconds
        self._clock = clock
        self._token: str | None = None
        self._expires_at: float = 0.0
        self.fetch_count = 0

    def get(self) -> str:
        if self._token is None or self._clock() >= self._expires_at:
            token, expires_in = self._fetch()
            self.fetch_count += 1
            self._token = token
            self._expires_at = self._clock() + max(expires_in - self._safety, 0.0)
        return self._token

    def invalidate(self) -> None:
        self._token = None


def json_token_fetcher(auth_url: str, timeout: float = 10.0):
    """Fetch {'access_token', 'expires_in'} from an auth endpoint —
    the reference's client-credentials POST, stdlib-only."""

    def fetch() -> tuple[str, float]:
        req = urllib.request.Request(auth_url, data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        return body["access_token"], float(body.get("expires_in", 3600))

    return fetch


class HttpPostTransport:
    """POST one JSON payload per call with bearer auth.

    - 401 -> invalidate the token cache, refresh, retry once (stale
      token, the reference's re-auth path);
    - 5xx / connection error -> bounded retry with linear backoff;
    - returns the final HTTP status (0 for a connection that never
      succeeded), so the caller's delivery report stays total."""

    def __init__(
        self,
        url: str,
        tokens: TokenCache,
        timeout: float = 10.0,
        max_retries: int = 2,
        backoff_seconds: float = 0.1,
    ) -> None:
        self.url = url
        self.tokens = tokens
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff = backoff_seconds

    def _attempt(self, payload_json: str) -> int:
        req = urllib.request.Request(
            self.url,
            data=payload_json.encode("utf-8"),
            method="POST",
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.tokens.get()}",
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code
        except urllib.error.URLError:
            return 0

    def post(self, payload_json: str) -> int:
        status = self._attempt(payload_json)
        if status == 401:  # stale token: refresh once and retry
            self.tokens.invalidate()
            status = self._attempt(payload_json)
        retries = 0
        while (status == 0 or status >= 500) and retries < self.max_retries:
            retries += 1
            time.sleep(self.backoff * retries)
            status = self._attempt(payload_json)
        return status


def deliver_payloads(
    payloads: DataFrame,
    transport_factory: Callable[[], HttpPostTransport],
) -> DataFrame:
    """(doc_id, payload_json) -> (doc_id, status, ok) delivery report.

    One transport per partition (one token fetch, not one per doc);
    Arrow-batched via mapInPandas.  The report is a LAZY side-effecting
    plan: each evaluation of it re-POSTs every payload.  Contract for
    at-least-once delivery (round-2 advice): the caller must trigger it
    EXACTLY ONCE — write it to the report table (or persist it) first,
    and drive any retry anti-join from that materialized report, never
    from this live DataFrame.  Consuming the returned frame twice (e.g.
    write + a second join against it) silently doubles every POST."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        transport = transport_factory()
        for pdf in batches:
            statuses = [transport.post(j) for j in pdf["payload_json"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "status": pd.Series(statuses, dtype="int32"),
                    "ok": [200 <= s < 300 for s in statuses],
                }
            )

    return payloads.select("doc_id", "payload_json").mapInPandas(
        run, "doc_id string, status int, ok boolean"
    )
