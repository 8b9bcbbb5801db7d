"""Recorded-fixture HTTP client for the API source/sink plumbing.

The reference talks to its two APIs over HTTP with Guzzle-style clients
(APIHelper.php:41-105 builds paginated GETs; TicketProcessor.php:133-142
falls back to a raw URL fetch). This repo never does live HTTP; instead
this module provides the HTTP-SHAPED seam those tests exercise:

  - RecordedTransport: replays canned (status, body) responses per URL,
    in order, last-response-repeats -- a VCR-style cassette. Scripted
    429/500 prefixes drive the retry/backoff path exactly where it runs
    in production: inside the executor task that owns the page.
  - FixtureHttpClient: maps transport responses onto the injected-
    callable contracts of sources/api.py (FetchPage / FetchById /
    publish), translating status codes into the retry taxonomy:
    429/5xx -> TransientApiError (retryable), other non-200 -> ApiError
    (permanent, record-level fault isolation sees it).

Executor-safety: a client is cloudpickled by value into mapInPandas /
foreachPartition closures, so each task gets its own replay state --
which is correct, because retries happen within the task that issued
the request. Published receipts are spooled to a directory (one
uniquely-named JSON file per POST) so the driver can observe what the
"server" received across executor processes.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterable
from typing import Any

from .retry import TransientApiError

Response = tuple[int, str]  # (status_code, body)


class ApiError(Exception):
    """Permanent (non-retryable) HTTP failure: 4xx other than 429."""


class RecordedTransport:
    """Replays a canned script: url -> ordered list of (status, body).

    Each GET consumes the next scripted response for that URL; once the
    list is exhausted the last response repeats (so retries past the
    scripted failures see the steady-state answer). Unknown URLs 404.
    """

    def __init__(self, script: dict[str, list[Response]], spool_dir: str | None = None):
        self.script = {u: list(rs) for u, rs in script.items()}
        self.calls: dict[str, int] = {}
        self.spool_dir = spool_dir

    def get(self, url: str) -> Response:
        seq = self.script.get(url)
        if not seq:
            return (404, json.dumps({"error": "not found", "url": url}))
        i = self.calls.get(url, 0)
        self.calls[url] = i + 1
        return seq[min(i, len(seq) - 1)]

    def post(self, url: str, payload: Any) -> Response:
        """Accepts the POST and spools it for driver-side inspection."""
        if self.spool_dir is not None:
            os.makedirs(self.spool_dir, exist_ok=True)
            name = f"post-{uuid.uuid4().hex}.json"
            with open(os.path.join(self.spool_dir, name), "w") as f:
                json.dump({"url": url, "payload": payload}, f)
        return (201, json.dumps({"ok": True}))


def _raise_for_status(status: int, url: str) -> None:
    if status == 429 or status >= 500:
        raise TransientApiError(f"{status} from {url}")
    if status != 200:
        raise ApiError(f"{status} from {url}")


class FixtureHttpClient:
    """Adapts a RecordedTransport to the sources/api.py callables."""

    def __init__(self, transport: RecordedTransport,
                 base_url: str = "https://api.example.test/v1"):
        self.transport = transport
        self.base_url = base_url

    # --- S3: metadata probe (driver-side, one request) ---
    def probe_total(self, resource: str = "tickets") -> int:
        url = f"{self.base_url}/{resource}?page=1&per_page=1"
        status, body = self.transport.get(url)
        _raise_for_status(status, url)
        return int(json.loads(body)["meta"]["pagination"]["total_count"])

    # --- S1/S2: FetchPage ---
    def fetch_page(self, page: int, per_page: int,
                   resource: str = "tickets") -> list[dict[str, Any]]:
        url = f"{self.base_url}/{resource}?page={page}&per_page={per_page}"
        status, body = self.transport.get(url)
        _raise_for_status(status, url)
        return json.loads(body)[resource]

    # --- S4/S8: FetchById (raw URL fetch) ---
    def fetch_by_id(self, rec_id: Any,
                    resource: str = "tickets") -> dict[str, Any] | None:
        url = f"{self.base_url}/{resource}/{rec_id}"
        status, body = self.transport.get(url)
        if status == 404:
            return None
        _raise_for_status(status, url)
        return json.loads(body)

    # --- K1/K2: publish ---
    def publish(self, batch: list[dict[str, Any]],
                resource: str = "conversations") -> None:
        url = f"{self.base_url}/{resource}"
        status, _ = self.transport.post(url, batch)
        if status not in (200, 201):
            raise ApiError(f"{status} from {url}")


def paged_script(
    records: Iterable[dict[str, Any]],
    per_page: int,
    resource: str = "tickets",
    base_url: str = "https://api.example.test/v1",
    flaky: dict[int, list[int]] | None = None,
) -> dict[str, list[Response]]:
    """Build a cassette for a paginated resource.

    ``flaky`` maps page -> list of status codes to serve BEFORE the 200
    (e.g. {3: [429, 500]} makes page 3 fail twice, then succeed).
    Includes the 1-record probe URL carrying total_count metadata.
    """
    recs = list(records)
    total = len(recs)
    flaky = flaky or {}
    meta = {"meta": {"pagination": {"total_count": total, "per_page": per_page}}}
    script: dict[str, list[Response]] = {
        f"{base_url}/{resource}?page=1&per_page=1": [
            (200, json.dumps({resource: recs[:1], **meta}))
        ]
    }
    n_pages = (total + per_page - 1) // per_page
    for page in range(1, n_pages + 1):
        body = json.dumps(
            {resource: recs[(page - 1) * per_page : page * per_page], **meta}
        )
        responses = [
            (code, json.dumps({"error": code})) for code in flaky.get(page, [])
        ]
        responses.append((200, body))
        script[f"{base_url}/{resource}?page={page}&per_page={per_page}"] = responses
    return script
