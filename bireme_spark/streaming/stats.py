"""Pipeline observability — the Spark twin of bireme's PipeLineStat
(codahale meters/timers, ``PipeLineStat.java``) and StateServer's
JSON state endpoint (``StateServer.java:120-210``).

Structured Streaming already emits per-batch progress; this listener
folds it into the same shape bireme reports (records/s, delay,
per-source totals) and ``state()`` renders the StateServer-style
snapshot dict (serve it over HTTP if needed — the engine itself
stays transport-agnostic)."""

from __future__ import annotations

import json
import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class PipelineStatListener(StreamingQueryListener):
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._by_query: dict[str, dict[str, Any]] = {}

    # StreamingQueryListener contract
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._by_query[str(event.id)] = {
                "name": event.name,
                "status": "running",
                "batches": 0,
                "total_rows": 0,
                "last_rows_per_sec": 0.0,
                "last_batch_ms": 0,
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            st = self._by_query.setdefault(str(p.id), {"batches": 0, "total_rows": 0})
            st["batches"] += 1
            st["total_rows"] += p.numInputRows
            st["last_rows_per_sec"] = p.processedRowsPerSecond or 0.0
            st["last_batch_ms"] = (p.durationMs or {}).get("triggerExecution", 0)
            st["status"] = "running"

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            st = self._by_query.setdefault(str(event.id), {})
            st["status"] = "error" if event.exception else "stopped"

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def state(self) -> dict[str, Any]:
        """StateServer-style snapshot of every pipeline."""
        with self._lock:
            return {"source": dict(self._by_query)}

    def state_json(self) -> str:
        return json.dumps(self.state(), default=str, indent=2)
