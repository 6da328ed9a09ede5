"""HTTP serving topology (reference WebServer parity,
`src/Server/WebServer.cc:180-240`).

The reference runs three processes: a gateway WebServer that
double-URL-decodes and forwards, a KeyServer (suggestions, LRU cache
pool) and a PageServer (whole index in RAM, scores queries).  Here the
gateway is a stdlib ``ThreadingHTTPServer`` and the two backends are
the engine's existing distributed state: the ``QueryEngine`` scorer
actor pool (T4) and a ``SuggesterActor`` (T5/T6).  Endpoints:

- ``GET /s/<key>``    — double percent-decode (M6), BM25 top-10 JSON
  (`WebServer.cc:193-202`).
- ``GET /sug/<key>``  — double percent-decode, suggestion top-10 JSON
  (`WebServer.cc:183-190`).
- ``GET /link/<url>`` — base64url-decoded (M7) JSON jump info; the
  click event is appended to the day-partitioned clicks sink (S7, the
  Kafka-topic analogue) and the response is a 302 to the target URL
  (`WebServer.cc:205-237`).

Serving is NOT the batch engine's contract — this wires the existing,
tested pieces into the reference's process topology so a reference
user finds the same surface.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..functions.urlcodec import base64url_decode, double_percent_decode


class SearchGateway:
    """Owns the backends; ``handler()`` builds the request handler
    class bound to this gateway (stdlib server API)."""

    def __init__(self, query_engine, suggester, clicks_dir: str | None = None):
        self.eng = query_engine
        self.sug = suggester
        self.clicks_dir = clicks_dir
        self.click_buffer: list[dict] = []
        self._lock = threading.Lock()

    # -------------------------------------------------- endpoint logic

    def search(self, key: str) -> list[dict]:
        q = double_percent_decode(key)
        return self.eng.bm25_topk(q, k=10)

    def suggest(self, key: str) -> list[dict]:
        q = double_percent_decode(key)
        import ray
        if isinstance(self.sug, ray.actor.ActorHandle):
            # the documented SuggesterActor backend: remote call +
            # resolve (a raw handle can't be invoked directly)
            return ray.get(self.sug.suggest.remote(q, k=10))
        return self.sug.suggest(q, k=10)

    # buffered clicks auto-flush to the sink at this size; flush is
    # also called on server shutdown (stop_server)
    CLICK_FLUSH_EVERY = 512

    def link(self, b64: str) -> str:
        """Record the click; returns the redirect URL."""
        info = json.loads(base64url_decode(b64))
        url = str(info.get("url", ""))
        if "\r" in url or "\n" in url:
            # CRLF in a Location header = HTTP response splitting;
            # stdlib send_header does not validate
            raise ValueError("invalid redirect URL")
        # open-redirect guard: block dangerous SCHEMES
        # (javascript:/data:/file: in a Location header is an attack,
        # not parity — the reference 302s to whatever the payload says,
        # `WebServer.cc:205-237`).  Scheme-less targets stay allowed:
        # relative paths and protocol-relative //host URLs are
        # legitimate corpus links and must keep their click analytics.
        from urllib.parse import urlsplit
        scheme = urlsplit(url).scheme.lower()
        if scheme not in ("", "http", "https"):
            raise ValueError("redirect scheme must be http(s)")
        # Location must be latin-1 encodable: percent-encode anything
        # beyond it (keeps already-valid URLs byte-identical)
        from urllib.parse import quote
        url = quote(url, safe=":/?#[]@!$&'()*+,;=%-._~")
        event = {"ts": int(info.get("ts", 0)),
                 "url": url,
                 "query": str(info.get("data", {}).get("query", "")),
                 "doc_id": int(info.get("data", {}).get("doc_id", -1)),
                 "rank": int(info.get("data", {}).get("rank", -1))}
        with self._lock:
            self.click_buffer.append(event)
            full = len(self.click_buffer) >= self.CLICK_FLUSH_EVERY
        if full:
            self.flush_clicks()
        return url

    def flush_clicks(self) -> int:
        """Write buffered click events to the parquet sink (S7)."""
        from .clicks import clicks_table, write_clicks
        with self._lock:
            rows, self.click_buffer = self.click_buffer, []
        if rows and self.clicks_dir:
            write_clicks(clicks_table(rows), self.clicks_dir)
        return len(rows)

    # ---------------------------------------------------- http plumbing

    def handler(self):
        gw = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # silence per-request stderr
                pass

            def _json(self, obj, status=200):
                body = json.dumps(obj).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    if self.path.startswith("/s/"):
                        self._json(gw.search(self.path[3:]))
                    elif self.path.startswith("/sug/"):
                        self._json(gw.suggest(self.path[5:]))
                    elif self.path.startswith("/link/"):
                        url = gw.link(self.path[6:])
                        self.send_response(302)
                        self.send_header("Location", url)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                    else:
                        self._json({"error": "not found"}, 404)
                except Exception as e:   # noqa: BLE001 — surface as 500
                    self._json({"error": str(e)}, 500)

        return Handler


def start_server(gateway: SearchGateway, port: int = 0):
    """Start the gateway on ``port`` (0 = ephemeral).  Returns
    ``(server, thread)``; call ``stop_server(server, thread,
    gateway)`` (or ``server.shutdown()`` + ``gateway.flush_clicks()``)
    to stop without losing buffered clicks."""
    srv = ThreadingHTTPServer(("127.0.0.1", port), gateway.handler())
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv, th


def stop_server(server, thread, gateway: SearchGateway) -> int:
    """Shut the gateway down and flush any buffered clicks (S7 sink
    contract: no click recorded by /link is lost on clean shutdown)."""
    server.shutdown()
    thread.join(timeout=10)
    return gateway.flush_clicks()
