"""HTTP serving: a resident SlidePredictor behind a JSON endpoint.

The reference has no serving story at all (its stages are glued by files
on disk, SURVEY.md section 1); this is the long-running production face of
:mod:`sequoia_tpu.serve` — the model + backbone load and jit ONCE, then
each request streams a WSI through the decode->screen->featurize->k-means->
ViS pipeline (cross-slide pipelined for multi-slide requests).

Slides are referenced by path (pathology WSIs are GB-scale; the realistic
deployment pattern is a shared filesystem / mounted bucket, not request
bodies).  Stdlib-only (``http.server``) so the dependency surface stays
the baked-in set.

    POST /predict   {"wsi": "/data/slide.svs"} or {"wsi": [paths...]}
                    -> {"predictions": {name: {gene: value}},
                        "failed": {name: error}}
    GET  /genes     -> {"genes": [...], "n": G}
    GET  /healthz   -> {"status": "ok", "folds": k, "feat_type": ...}

Requests are served one pipeline run at a time (a lock serializes the
predictor: device throughput comes from batching inside a run, not from
concurrent runs fighting over the chip).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class PredictorService:
    """Thread-safe wrapper: one SlidePredictor, serialized pipeline runs."""

    def __init__(self, predictor, genes: list[str]):
        self.predictor = predictor
        self.genes = list(genes)
        self._lock = threading.Lock()
        self.requests = 0
        self.slides_ok = 0
        self.slides_failed = 0
        self.last_slide_seconds: float | None = None

    def predict(self, paths: list[str]) -> tuple[dict, dict]:
        """paths -> ({name: {gene: float}}, {name: error})."""
        import time

        failed: dict[str, str] = {}

        def on_error(path, e):
            failed[path] = f"{type(e).__name__}: {e}"

        import math

        def jsonable(v) -> float | None:
            # json.dumps would emit a literal NaN/Infinity token (invalid
            # RFC-8259) and strict parsers would reject the WHOLE response
            f = float(v)
            return f if math.isfinite(f) else None

        results: dict[str, dict] = {}
        with self._lock:
            self.requests += 1
            t0 = time.perf_counter()
            for path, out in self.predictor.predict_slides(
                    paths, on_error=on_error):
                results[path] = {g: jsonable(v)
                                 for g, v in zip(self.genes, out[0])}
            dt = time.perf_counter() - t0
            self.slides_ok += len(results)
            self.slides_failed += len(failed)
            if results:
                self.last_slide_seconds = round(dt / len(results), 3)
        return results, failed

    def health(self) -> dict:
        p = self.predictor
        return {"status": "ok", "folds": len(p.vis_models),
                "feat_type": p.extractor.feat_type,
                "genes": len(self.genes),
                "requests": self.requests,
                "slides_ok": self.slides_ok,
                "slides_failed": self.slides_failed,
                "last_slide_seconds": self.last_slide_seconds}


class _Handler(BaseHTTPRequestHandler):
    service: PredictorService  # set by make_server

    def _reply(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # route to stderr-free quiet default
        pass

    def do_GET(self):
        if self.path == "/healthz":
            return self._reply(200, self.service.health())
        if self.path == "/genes":
            return self._reply(200, {"genes": self.service.genes,
                                     "n": len(self.service.genes)})
        return self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/predict":
            return self._reply(404, {"error": f"unknown path {self.path}"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n < 0 or n > 1 << 20:  # paths, not payloads: 1 MiB is ample
                return self._reply(413, {"error": f"bad Content-Length {n}"})
            req = json.loads(self.rfile.read(n) or b"{}")
            wsi = req.get("wsi") if isinstance(req, dict) else None
            if isinstance(wsi, str):
                wsi = [wsi]
            if not wsi or not isinstance(wsi, list):
                return self._reply(
                    400, {"error": 'body must be {"wsi": path or [paths]}'})
        except (ValueError, json.JSONDecodeError) as e:
            return self._reply(400, {"error": f"bad request: {e}"})
        try:
            results, failed = self.service.predict([str(p) for p in wsi])
        except Exception as e:  # predictor bug: report, keep serving
            return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
        self._reply(200 if results or not failed else 502,
                    {"predictions": results, "failed": failed})


def make_server(service: PredictorService, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``.serve_forever()`` to run,
    ``.server_address`` for the bound (host, port) — port 0 picks a free
    one (used by tests)."""
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def run(service: PredictorService, host: str, port: int) -> None:
    srv = make_server(service, host, port)
    h, p = srv.server_address[:2]
    print(f"serving on http://{h}:{p}  (POST /predict, GET /genes, "
          f"GET /healthz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
