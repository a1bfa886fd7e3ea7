"""Request-batching HTTP server over an InferenceEngine.

Stdlib-only (no gradio/fastapi in the image). Requests queue; a single
dispatcher thread coalesces up to ``engine.cfg.batch_size`` of them within a
``max_wait_ms`` window and runs one fixed-shape device batch — the standard
TPU serving pattern (one compiled graph, padding over recompiles, batching
over per-request dispatch).

API:
  GET  /healthz    -> {"ok": true, "stats": {...}}
  GET  /stats      -> latency percentiles, throughput, batch occupancy
  POST /generate   {"prompt": str, "seed": int?, "adapter": str?}
                   -> {"image_b64": png, "batch_size": n, "latency_ms": t};
                   "adapter" picks a registered named adapter — the
                   dispatcher groups same-adapter requests into one batch
  POST /lora       {"path": str, "name": str?}  -> without "name": hot-swap
                    the default LoRA adapter (kohya safetensors) without
                    recompiling (in-flight batches finish on the old
                    weights); with "name": register it for per-request
                    "adapter" routing (multi-tenant serving)
  DELETE /lora/<name>  -> unregister a named adapter (frees its HBM)
"""

from __future__ import annotations

import base64
import collections
import io
import json
import os
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .engine import InferenceEngine


class _Pending:
    __slots__ = ("prompt", "seed", "adapter", "future", "t0")

    def __init__(self, prompt: str, seed: int, adapter: Optional[str] = None):
        self.prompt = prompt
        self.seed = seed
        self.adapter = adapter
        self.future: Future = Future()
        self.t0 = time.monotonic()


class BatchingServer:
    def __init__(
        self,
        engine: InferenceEngine,
        host: str = "127.0.0.1",
        port: int = 0,
        max_wait_ms: float = 50.0,
    ):
        self.engine = engine
        self.max_wait_s = max_wait_ms / 1000.0
        # rolling observability window (stdlib-only): per-request end-to-end
        # latency (queue wait + device batch) and per-batch occupancy
        self._lat_ms: "collections.deque[float]" = collections.deque(maxlen=2048)
        self._occupancy: "collections.deque[int]" = collections.deque(maxlen=512)
        self._errors = 0
        self._t_start = time.monotonic()
        self._stats_lock = threading.Lock()
        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def address(self):
        return self._httpd.server_address  # (host, port) — port resolved if 0

    def start(self) -> None:
        self._dispatcher.start()
        self._serve_thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._queue.put(None)
        self._dispatcher.join(timeout=10)

    def serve_forever(self) -> None:
        self.start()
        self._serve_thread.join()

    # -- batching core ------------------------------------------------------

    def _dispatch_loop(self) -> None:
        """Coalesce requests into device batches, grouped by adapter: a batch
        runs one adapter, so requests for different adapters ride different
        batches. A bucket dispatches when full, or when its oldest request's
        ``max_wait`` window expires (FIFO across buckets — a minority-adapter
        request can't starve behind a busy default stream)."""
        b = self.engine.cfg.batch_size
        buckets: "dict[Optional[str], list]" = {}
        while True:
            timeout = None
            if buckets:
                oldest = min(bk[0].t0 for bk in buckets.values())
                timeout = oldest + self.max_wait_s - time.monotonic()
                if timeout <= 0:
                    # flush the bucket whose head has waited longest
                    name = min(buckets, key=lambda k: buckets[k][0].t0)
                    self._run(buckets.pop(name))
                    continue
            try:
                nxt = self._queue.get(timeout=timeout)
            except queue.Empty:
                continue  # re-check deadlines
            if nxt is None:
                for batch in buckets.values():  # shutdown: flush everything
                    self._run(batch)
                return
            buckets.setdefault(nxt.adapter, []).append(nxt)
            if len(buckets[nxt.adapter]) >= b:
                self._run(buckets.pop(nxt.adapter))

    def _run(self, batch) -> None:
        try:
            imgs = self.engine.generate_batch(
                [p.prompt for p in batch], [p.seed for p in batch],
                adapter=batch[0].adapter,
            )
            done = time.monotonic()
            for p, img in zip(batch, imgs):
                p.future.set_result((img, len(batch)))
            with self._stats_lock:
                self._occupancy.append(len(batch))
                for p in batch:
                    self._lat_ms.append((done - p.t0) * 1000.0)
        except Exception as e:  # surface engine failures to every waiter
            with self._stats_lock:
                self._errors += 1
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(e)

    def stats(self) -> dict:
        """Rolling-window serving stats: latency percentiles, throughput,
        batch occupancy (device-batch fill vs the compiled batch size)."""
        with self._stats_lock:
            lats = sorted(self._lat_ms)
            occ = list(self._occupancy)
            errors = self._errors
        uptime = time.monotonic() - self._t_start

        def pct(q: float) -> Optional[float]:
            if not lats:
                return None
            return round(lats[min(len(lats) - 1, int(q * len(lats)))], 1)

        eng = dict(self.engine.stats)
        return {
            **eng,
            "errors": errors,
            "uptime_s": round(uptime, 1),
            "requests_per_s": round(eng.get("requests", 0) / max(uptime, 1e-9), 3),
            "latency_ms": {"p50": pct(0.5), "p90": pct(0.9), "p99": pct(0.99)},
            "batch_occupancy": round(sum(occ) / (len(occ) * self.engine.cfg.batch_size), 3)
            if occ else None,
            "window": len(lats),
        }

    # -- http ---------------------------------------------------------------

    def _make_handler(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"ok": True, "stats": outer.engine.stats})
                elif self.path == "/stats":
                    self._json(200, outer.stats())
                else:
                    self._json(404, {"error": "unknown path"})

            def do_DELETE(self):
                # DELETE /lora/<name>: unregister a named adapter (frees the
                # full f32 LoRA tree it pins in HBM)
                if self.path.startswith("/lora/"):
                    name = self.path[len("/lora/"):]
                    try:
                        outer.engine.unregister_adapter(name)
                    except KeyError as e:
                        self._json(404, {"error": f"{e}"})
                        return
                    self._json(200, {"ok": True,
                                     "adapters": outer.engine.adapter_names})
                    return
                self._json(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path == "/lora":
                    try:
                        length = int(self.headers.get("Content-Length", 0))
                        req = json.loads(self.rfile.read(length) or b"{}")
                        path = req["path"]
                        if not os.path.isfile(path):
                            raise FileNotFoundError(path)
                        name = req.get("name")
                        if name is not None:  # register for per-request routing
                            outer.engine.register_adapter(name, path)
                        else:  # swap the default adapter
                            outer.engine.load_lora(path)
                    except (ValueError, KeyError, FileNotFoundError,
                            json.JSONDecodeError) as e:
                        # client errors: bad payload, unknown file, or a tree
                        # that would force a recompile
                        self._json(400, {"error": f"{type(e).__name__}: {e}"})
                        return
                    except Exception as e:
                        # genuine server-side failures (device OOM while
                        # replicating the adapter, loader bugs) are not the
                        # client's fault
                        self._json(500, {"error": f"{type(e).__name__}: {e}"})
                        return
                    self._json(200, {
                        "ok": True,
                        "lora": outer.engine.lora_source,
                        "adapters": outer.engine.adapter_names,
                        "swaps": outer.engine.stats["lora_swaps"],
                    })
                    return
                if self.path != "/generate":
                    self._json(404, {"error": "unknown path"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    prompt = req["prompt"]
                    seed = int(req.get("seed", 0))
                    adapter = req.get("adapter")
                    if adapter is not None and adapter not in outer.engine.adapters:
                        raise KeyError(f"unknown adapter {adapter!r}")
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    self._json(400, {"error": f"bad request: {e}"})
                    return
                pending = _Pending(prompt, seed, adapter)
                outer._queue.put(pending)
                try:
                    img, bsz = pending.future.result(timeout=600)
                except Exception as e:
                    self._json(500, {"error": str(e)})
                    return
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                self._json(
                    200,
                    {
                        "image_b64": base64.b64encode(buf.getvalue()).decode(),
                        "batch_size": bsz,
                        "latency_ms": round(
                            (time.monotonic() - pending.t0) * 1000, 1
                        ),
                    },
                )

        return Handler
