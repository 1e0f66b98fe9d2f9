"""Minimal batching inference server (stdlib-only HTTP, no extra deps).

The reference has "no serving daemon" (SURVEY.md TL;DR); this adds the missing
production-serving surface the TPU deployment story needs: a background batcher
that coalesces concurrent requests into one MXU-bound forward (the whole point
of TPU inference is batch amortization), in front of DinoEngine.

Endpoints:
  POST /classify   body: raw image bytes (jpg/png)   -> {"topk": [[label, p], ...]}
  POST /features   body: raw image bytes             -> {"cls_token": [...], "grid": [h, w]}
  POST /pca        body: raw image bytes             -> PNG bytes (the uint8 PCA
                   visualization — the reference feature mode's actual product,
                   /root/reference/inference.cpp:76-99, over HTTP)
  GET  /healthz                                      -> {"ok": true, "model": {...}}

Batching: requests arriving within `max_wait_ms` (or until `max_batch`) are run
as one forward. Decode happens on the server thread; device work on the batcher
thread only, so the jit cache is used from a single thread.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import numpy as np


@dataclass
class _Pending:
    image: np.ndarray
    mode: str  # "classify" | "features"
    event: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: str | None = None
    t_enq: float = 0.0  # perf_counter at enqueue, for request-latency stats


class BatchingServer:
    def __init__(
        self,
        engine,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
        topk: int = 5,
        request_timeout_s: float = 600.0,
        max_body_mb: float = 32.0,
        max_side: int = 4096,
    ):
        self.engine = engine
        self.topk = topk
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.request_timeout_s = request_timeout_s
        # Request caps: an unbounded body is a memory-DoS, and an unbounded
        # image resolution is a COMPILE bomb on this runtime — every new
        # feature-mode size compiles its own XLA program (T grows with
        # pixels; a 100-MP PNG would hold the device for minutes). 413/400
        # instead, with the limit in the message.
        self.max_body_bytes = int(max_body_mb * 1024 * 1024)
        self.max_side = max_side
        self._queue: queue.Queue[_Pending] = queue.Queue()
        self._stop = threading.Event()
        self._batcher = threading.Thread(target=self._batch_loop, daemon=True)
        self.stats = {"requests": 0, "batches": 0, "images": 0}
        # enqueue->completion wall time of the last 1024 successful requests
        # (deque.append is atomic under the GIL; readers snapshot)
        import collections

        self._latencies: collections.deque[float] = collections.deque(maxlen=1024)

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    cfg = server.engine.config
                    self._reply(
                        200,
                        {
                            "ok": True,
                            "model": {
                                "hidden_size": cfg.hidden_size,
                                "layers": cfg.num_hidden_layers,
                                "registers": cfg.num_register_tokens,
                            },
                            "stats": server.stats,
                            "latency_ms": server.latency_stats(),
                        },
                    )
                else:
                    self._reply(404, {"error": "not found"})

            def _reply_png(self, data: bytes):
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self):
                mode = {
                    "/classify": "classify",
                    "/features": "features",
                    "/pca": "pca",
                }.get(self.path)
                if mode is None:
                    self._reply(404, {"error": "not found"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length > server.max_body_bytes:
                    self.close_connection = True  # don't drain the huge body
                    self._reply(413, {
                        "error": f"body {length} bytes exceeds the "
                        f"{server.max_body_bytes}-byte limit"
                    })
                    return
                data = self.rfile.read(length)
                try:
                    import cv2

                    buf = np.frombuffer(data, dtype=np.uint8)
                    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
                    if img is None:
                        raise ValueError("image decode failed")
                    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                except Exception as e:  # noqa: BLE001
                    self._reply(400, {"error": str(e)})
                    return
                if max(img.shape[0], img.shape[1]) > server.max_side:
                    self._reply(400, {
                        "error": f"image {img.shape[1]}x{img.shape[0]} exceeds "
                        f"the {server.max_side}px side limit (each new size "
                        f"compiles its own program)"
                    })
                    return
                pending = _Pending(image=img, mode=mode, t_enq=time.perf_counter())
                server._queue.put(pending)
                if not pending.event.wait(timeout=server.request_timeout_s):
                    # Batcher thread dead/wedged — never reply 200 with null.
                    self._reply(504, {"error": "inference timed out"})
                elif pending.error:
                    self._reply(500, {"error": pending.error})
                else:
                    server._latencies.append(time.perf_counter() - pending.t_enq)
                    if isinstance(pending.result, bytes):
                        self._reply_png(pending.result)
                    else:
                        self._reply(200, pending.result)

        self._http = ThreadingHTTPServer((host, port), Handler)
        self.port = self._http.server_address[1]

    # ------------------------------------------------------------------
    def latency_stats(self) -> dict[str, float] | None:
        """p50/p90/p99/max over the last <=1024 request latencies, in ms.
        None until the first request completes (healthz before any traffic)."""
        snap = sorted(self._latencies)
        if not snap:
            return None
        pick = lambda q: snap[min(len(snap) - 1, int(q * len(snap)))]  # noqa: E731
        return {
            "count": len(snap),
            "p50": round(pick(0.50) * 1e3, 2),
            "p90": round(pick(0.90) * 1e3, 2),
            "p99": round(pick(0.99) * 1e3, 2),
            "max": round(snap[-1] * 1e3, 2),
        }

    # ------------------------------------------------------------------
    def _batch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait_ms / 1e3
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run_batch(batch)

    def _run_batch(self, batch: list[_Pending]):
        self.stats["batches"] += 1
        self.stats["images"] += len(batch)
        by_mode: dict[str, list[_Pending]] = {}
        for p in batch:
            by_mode.setdefault(p.mode, []).append(p)
        for mode, items in by_mode.items():
            try:
                if mode == "classify":
                    results = self.engine.classify(
                        [p.image for p in items], topk=self.topk
                    )
                    for p, r in zip(items, results):
                        p.result = {"topk": [[label, prob] for label, prob in r]}
                elif mode == "pca":
                    # engine groups same-size frames into one fused
                    # preprocess+forward+vmapped-PCA program per size
                    import cv2

                    for p, vis in zip(
                        items, self.engine.pca_visualizations([p.image for p in items])
                    ):
                        ok, png = cv2.imencode(".png", cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
                        if not ok:
                            raise ValueError("png encode failed")
                        p.result = png.tobytes()
                else:
                    # one batched forward per (H, W) shape group — mixed sizes
                    # can't share a program (the patch grid is shape-defining)
                    # but same-size concurrent requests coalesce
                    feats = self.engine.extract_features_mixed(
                        [p.image for p in items]
                    )
                    for p, f in zip(items, feats):
                        p.result = {
                            "cls_token": f["cls_token"].tolist(),
                            "grid": list(f["grid"]),
                        }
            except Exception as e:  # noqa: BLE001
                for p in items:
                    p.error = str(e)
            finally:
                for p in items:
                    p.event.set()

    # ------------------------------------------------------------------
    def start(self):
        self._batcher.start()
        threading.Thread(target=self._http.serve_forever, daemon=True).start()

    def stop(self):
        self._stop.set()
        self._http.shutdown()

    def serve_forever(self):
        self._batcher.start()
        self._http.serve_forever()
