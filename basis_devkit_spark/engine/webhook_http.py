"""HTTP webhook ingestion endpoint — the push-based front door.

Reference behavior (`/root/reference/patterns/cli/commands/create.py:177-197`,
`/root/reference/patterns/node/node.py:544-553`): each webhook node exposes
an HTTP URL; POSTing JSON lands the body in the webhook's auto-created
output table and fires downstream propagation. A request that wants a
response (``?wait=1``) gets a generated ``patterns_request_key`` column
added to its ingested row(s); node code answers via
``respond_to_request(key, payload)`` and the payload becomes the HTTP
response body.

Scale posture: this endpoint is an *ingestion port*, not a data plane — a
payload is appended as a micro-batch through the versioned store's normal
commit path (manifest flip, copy-on-write), so HTTP ingest inherits the
same crash-safety as any other write. The engine is single-writer; a lock
serializes concurrent POSTs.
"""

from __future__ import annotations

import hmac
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import TYPE_CHECKING
from urllib.parse import parse_qs, urlparse

if TYPE_CHECKING:
    from basis_devkit_spark.engine.engine import Engine

REQUEST_KEY_FIELD = "patterns_request_key"


class WebhookServer:
    """Thin ``http.server`` front over ``Engine.webhook_receive``.

    Routes:
      - ``GET  /webhooks``          → list webhook nodes + their URLs
      - ``POST /webhooks/<name>``   → ingest JSON body (object or array)
      - ``POST /webhooks/<name>?wait=1`` → ingest with a request key; if a
        node responds during propagation, that payload is the response.
    """

    def __init__(
        self,
        engine: "Engine",
        host: str = "127.0.0.1",
        port: int = 0,
        auth_token: str | None = None,
    ):
        """``auth_token``: when set, every request must carry
        ``Authorization: Bearer <token>`` (the hosted platform's webhook
        URLs are bearer-authenticated the same way; locally the token is
        the login token from ``cli_config``)."""
        self.engine = engine
        self._lock = threading.Lock()
        self._auth_token = auth_token
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authorized(self) -> bool:
                if outer._auth_token is None:
                    return True
                got = self.headers.get("Authorization", "")
                if hmac.compare_digest(got, f"Bearer {outer._auth_token}"):
                    return True
                self._json(401, {"error": "unauthorized"})
                return False

            def do_GET(self):
                if not self._authorized():
                    return
                if urlparse(self.path).path.rstrip("/") == "/webhooks":
                    self._json(
                        200,
                        [
                            {"name": n, "url": f"/webhooks/{n}"}
                            for n in outer.webhook_names()
                        ],
                    )
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if not self._authorized():
                    return
                url = urlparse(self.path)
                parts = [p for p in url.path.split("/") if p]
                if len(parts) != 2 or parts[0] != "webhooks":
                    self._json(404, {"error": "not found"})
                    return
                name = parts[1]
                if name not in outer.webhook_names():
                    self._json(404, {"error": f"no webhook named {name!r}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length") or 0)
                    payload = json.loads(self.rfile.read(length) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._json(400, {"error": "body must be valid JSON"})
                    return
                if not isinstance(payload, (dict, list)):
                    self._json(400, {"error": "body must be an object or array"})
                    return
                wait = parse_qs(url.query).get("wait", ["0"])[0] in ("1", "true")
                records = payload if isinstance(payload, list) else [payload]
                if not all(isinstance(r, dict) for r in records):
                    self._json(
                        400, {"error": "array body must contain only objects"}
                    )
                    return
                key = None
                if wait:
                    key = uuid.uuid4().hex
                    records = [{**r, REQUEST_KEY_FIELD: key} for r in records]
                idem = self.headers.get("Idempotency-Key")
                with outer._lock:
                    if idem and outer._idem_seen(name, idem):
                        # At-least-once client retry: acknowledge without
                        # re-ingesting (the standard Idempotency-Key
                        # contract; keys persist across restarts).
                        self._json(
                            200, {"ok": True, "duplicate": True, "records": 0}
                        )
                        return
                    try:
                        outer.engine.webhook_receive(name, records)
                    except Exception as exc:  # surface ingest failures
                        self._json(500, {"error": str(exc)})
                        return
                    if idem:
                        outer._idem_record(name, idem)
                    response = (
                        outer.engine.take_request_response(key)
                        if key is not None
                        else None
                    )
                if response is not None:
                    self._json(200, response)
                else:
                    ack = {"ok": True, "records": len(records)}
                    if key is not None:
                        ack[REQUEST_KEY_FIELD] = key
                    self._json(202, ack)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # Idempotency keys live in the engine's per-node state store (one JSON
    # doc per webhook under a reserved id), bounded to the most recent
    # _IDEM_MAX keys — O(1) metadata, survives restarts with the root.
    _IDEM_MAX = 1000

    def _idem_state_id(self, webhook: str) -> str:
        return f"__webhook_idem__{webhook}"

    def _idem_seen(self, webhook: str, key: str) -> bool:
        st = self.engine.state_store.load(self._idem_state_id(webhook))
        return key in (st.get("keys") or [])

    def _idem_record(self, webhook: str, key: str) -> None:
        sid = self._idem_state_id(webhook)
        st = self.engine.state_store.load(sid)
        keys = list(st.get("keys") or [])
        keys.append(key)
        self.engine.state_store.save(sid, {"keys": keys[-self._IDEM_MAX :]})

    def webhook_names(self) -> list[str]:
        g = self.engine.graph
        if g is None:
            return []
        return [n.webhook for n in g.functions if n.webhook]

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "WebhookServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
