"""HTTP control plane for PipelineManager.

Reference parity: ReplicatorHttpServer
(/root/reference/src/ReplicatorHttpServer.cpp:43-111) exposes POST
/start/{id}, POST /stop/{id}, GET /status over the in-process replicator
manager, with the posted JSON body merged over the configured defaults.
Spark mapping: a stdlib ThreadingHTTPServer in front of PipelineManager —
job submission stays in-session (SURVEY §3.3: cluster deployments submit via
spark-submit; this front is the single-driver control surface).

Routes:
  POST /start/<name>   body: JSON PipelineConfig fields, merged over the
                       server's `defaults`; 200 {"started": name},
                       409 if already running, 400 on bad config
  POST /stop/<name>    200 {"stopped": name}, 404 unknown name
  GET  /status         200 {name: {state, wall_sec, ...}}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from openlogparse_spark.jobs.manager import PipelineManager
from openlogparse_spark.pipeline import PipelineConfig


class ManagerHttpServer:
    """Bind with port=0 for an ephemeral port (read it back from .port)."""

    def __init__(self, manager: PipelineManager, host: str = "127.0.0.1",
                 port: int = 0, defaults: dict | None = None):
        mgr, base = manager, dict(defaults or {})

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a) -> None:  # noqa: D102 — silence stderr
                pass

            def do_GET(self) -> None:
                if self.path.rstrip("/") in ("", "/status"):
                    self._send(200, mgr.status())
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self) -> None:
                parts = [p for p in self.path.split("/") if p]
                if len(parts) != 2 or parts[0] not in ("start", "stop"):
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                verb, name = parts
                if verb == "stop":
                    try:
                        mgr.stop(name)
                        self._send(200, {"stopped": name})
                    except KeyError:
                        self._send(404, {"error": f"unknown pipeline {name!r}"})
                    return
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b"{}"
                try:
                    overrides = json.loads(raw or b"{}")
                    # config-merge semantics (ReplicatorHttpServer.cpp:88-99):
                    # posted fields override the server defaults
                    cfg = PipelineConfig(**{**base, **overrides})
                except (ValueError, TypeError) as e:
                    self._send(400, {"error": repr(e)})
                    return
                try:
                    mgr.start(name, cfg)
                    self._send(200, {"started": name})
                except ValueError as e:   # already running
                    self._send(409, {"error": str(e)})

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._srv.server_address[:2]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, name="manager-http", daemon=True)

    def start(self) -> "ManagerHttpServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
