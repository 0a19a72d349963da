"""HTTP state endpoint — the Spark twin of bireme's StateServer
(``StateServer.java:120-210``): ``GET /`` returns the full pipeline
state snapshot as JSON, ``GET /<source>`` the named source's state.

A daemon ``ThreadingHTTPServer`` wraps :class:`PipelineStatListener`
(which folds Structured Streaming progress events into the
PipeLineStat shape); the engine stays transport-agnostic — this is
the only HTTP surface.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from bireme_spark.streaming.stats import PipelineStatListener


class StateServer:
    """``StateServer(listener, port=8080).start()`` then
    ``GET http://addr:port/`` or ``/<query-name>``."""

    def __init__(
        self, listener: PipelineStatListener, addr: str = "127.0.0.1", port: int = 0
    ) -> None:
        self.listener = listener
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                state = outer.listener.state()
                path = self.path.strip("/")
                if path:
                    # per-source view: match by query name or id
                    by_name = {
                        str(st.get("name")): st for st in state["source"].values()
                    }
                    payload = state["source"].get(path) or by_name.get(path)
                    if payload is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                else:
                    payload = state
                body = json.dumps(payload, default=str, indent=2).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # silence per-request noise
                pass

        self._server = ThreadingHTTPServer((addr, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "StateServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
