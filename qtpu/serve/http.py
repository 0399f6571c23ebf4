"""Minimal HTTP serving front-end over the continuous batcher.

Stdlib-only (no server deps in this image): a ThreadingHTTPServer accepts
POST /generate requests; a single engine thread drives
ContinuousBatcher.step() so all device work stays on one thread (JAX
programs are not re-entrant), while request threads enqueue and wait.

Lock discipline: the batcher itself is touched ONLY by the engine thread.
Request threads hand work over through a small inbox guarded by `_lock`,
and `/health` reads a metrics snapshot the engine refreshes after every
step — neither ever waits for a device step to finish (a decode block is
tens of ms; holding a lock across it would stall health checks and
submissions).

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
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from qtpu.serve.batching import ContinuousBatcher


@dataclass
class _Pending:
    """A submission in flight from a request thread to the engine thread."""

    prompt_ids: list
    max_new_tokens: int
    temperature: float
    accepted: threading.Event = field(default_factory=threading.Event)
    req: object = None  # set by the engine thread, then `accepted` fires


class ServingFrontend:
    def __init__(self, batcher: ContinuousBatcher):
        self.batcher = batcher
        self._lock = threading.Lock()  # guards _inbox and _metrics only
        self._inbox: list[_Pending] = []
        self._metrics: dict = {"requests": 0}
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._engine_loop, daemon=True)
        self._thread.start()

    def _engine_loop(self):
        while not self._stop.is_set():
            with self._lock:
                pending, self._inbox = self._inbox, []
            for p in pending:
                p.req = self.batcher.submit(
                    p.prompt_ids,
                    max_new_tokens=p.max_new_tokens,
                    temperature=p.temperature,
                )
                p.accepted.set()
            busy = (
                bool(self.batcher.queue)
                or bool(self.batcher.prefilling)
                or bool(self.batcher.active)
            )
            if busy:
                self.batcher.step()  # device work, no lock held
            with self._lock:
                self._metrics = self.batcher.metrics()
            if not busy:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def metrics(self) -> dict:
        with self._lock:
            return dict(self._metrics)

    def submit_and_wait(self, prompt_ids, max_new_tokens=32, temperature=0.0,
                        timeout_s=300.0):
        p = _Pending(list(prompt_ids), int(max_new_tokens), float(temperature))
        with self._lock:
            self._inbox.append(p)
        self._wake.set()
        deadline = time.time() + timeout_s
        if not p.accepted.wait(timeout=timeout_s):
            return None
        # req fields are mutated by the engine thread only; `done` flips
        # last, so polling it is safe without a lock
        while not p.req.done and time.time() < deadline:
            time.sleep(0.01)
        return p.req

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
                self._json(200, {"status": "ok", **frontend.metrics()})
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
                if req is None or not req.done:
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
