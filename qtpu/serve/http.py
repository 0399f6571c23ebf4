"""Minimal HTTP serving front-end over the continuous batcher.

Stdlib-only (no server deps in this image): a ThreadingHTTPServer accepts
POST /generate requests; a single engine thread drives
ContinuousBatcher.step() so all device work stays on one thread (JAX
programs are not re-entrant), while request threads enqueue and wait.

API:
  POST /generate  {"prompt_ids": [..], "max_new_tokens": N,
                   "temperature": T}      → {"tokens": [..], "ttft_s": ..}
  GET  /health                            → {"status": "ok", ...metrics}

Start: python -m qtpu.serve --http PORT [model/quant flags as usual].
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from qtpu.serve.batching import ContinuousBatcher


class ServingFrontend:
    def __init__(self, batcher: ContinuousBatcher):
        self.batcher = batcher
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._engine_loop, daemon=True)
        self._thread.start()

    def _engine_loop(self):
        while not self._stop.is_set():
            with self._lock:
                busy = bool(self.batcher.queue) or bool(self.batcher.active)
                if busy:
                    self.batcher.step()
            if not busy:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def submit_and_wait(self, prompt_ids, max_new_tokens=32, temperature=0.0,
                        timeout_s=300.0):
        with self._lock:
            req = self.batcher.submit(
                prompt_ids, max_new_tokens=max_new_tokens, temperature=temperature
            )
        self._wake.set()
        deadline = time.time() + timeout_s
        while not req.done and time.time() < deadline:
            time.sleep(0.01)
        return req

    def shutdown(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=5)


def make_server(frontend: ServingFrontend, port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                with frontend._lock:
                    m = frontend.batcher.metrics()
                self._json(200, {"status": "ok", **m})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                prompt = payload["prompt_ids"]
                req = frontend.submit_and_wait(
                    prompt,
                    max_new_tokens=int(payload.get("max_new_tokens", 32)),
                    temperature=float(payload.get("temperature", 0.0)),
                )
                if not req.done:
                    self._json(504, {"error": "generation timed out"})
                    return
                self._json(
                    200,
                    {
                        "tokens": req.output,
                        "ttft_s": round(req.ttft, 4),
                        "tokens_per_second": (
                            round(req.tokens_per_second, 2)
                            if len(req.output) > 1
                            else None
                        ),
                    },
                )
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request: {e}"})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
