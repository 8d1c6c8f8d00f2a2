"""Stdlib HTTP adapter for the application shell.

The reference serves its app with FastAPI + uvicorn (reference
``main.py:38-46``). This adapter mounts :class:`ExplorerApp`'s route table on
``http.server.ThreadingHTTPServer`` — zero dependencies, which is what an
engine library embedded next to a Spark driver can afford. It only
translates transport: URL/query-string/JSON-body parsing in,
status/headers/body (streamed chunk-wise for NDJSON/CSV/HTML) out; all
routing, validation, and error mapping live in ``app.py`` where they are
unit-tested.

Not a production web server (no TLS, no backpressure tuning); it is the
e2e-serving harness and a workable single-node deployment. A real
deployment can mount the same ``ExplorerApp.handle`` behind any ASGI/WSGI
framework in a few lines.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlsplit

from iceberg_explorer_spark.service.app import ExplorerApp, Response

#: params the route layer expects as integers (query-strings are strings)
_INT_PARAMS = {"page_size", "offset", "page-size"}


def _parse_params(query: str) -> dict:
    params: dict = {}
    for k, v in parse_qsl(query, keep_blank_values=True):
        if k in _INT_PARAMS:
            try:
                params[k] = int(v)
            except ValueError:
                params[k] = v  # route-layer validation produces the 400
        else:
            params[k] = v
    return params


def make_handler(app: ExplorerApp):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet; app logs are correlated
            pass

        def _dispatch(self, method: str) -> None:
            url = urlsplit(self.path)
            path = unquote(url.path)
            params = _parse_params(url.query)
            body = None
            length = int(self.headers.get("Content-Length") or 0)
            if length:
                raw = self.rfile.read(length)
                try:
                    body = json.loads(raw)
                except json.JSONDecodeError:
                    self._send(
                        Response(status=400, body={"detail": "invalid JSON body"})
                    )
                    return
            self._send(app.handle(method, path, params=params, body=body))

        def _send(self, resp: Response) -> None:
            if resp.stream is not None:
                self.send_response(resp.status)
                self.send_header("Content-Type", resp.media_type)
                for k, v in resp.headers.items():
                    self.send_header(k, v)
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                for chunk in resp.stream:
                    data = chunk if isinstance(chunk, bytes) else chunk.encode()
                    if resp.media_type == "application/x-ndjson":
                        data += b"\n"
                    if data:
                        self.wfile.write(
                            f"{len(data):x}\r\n".encode() + data + b"\r\n"
                        )
                self.wfile.write(b"0\r\n\r\n")
                return
            payload = json.dumps(resp.body or {}).encode()
            self.send_response(resp.status)
            self.send_header("Content-Type", resp.media_type)
            for k, v in resp.headers.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def serve(app: ExplorerApp, host: str = "127.0.0.1", port: int = 8000):
    """Start serving in a daemon thread; returns the server (``.shutdown()``
    to stop). ``port=0`` picks a free port (``server.server_address[1]``)."""
    server = ThreadingHTTPServer((host, port), make_handler(app))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
