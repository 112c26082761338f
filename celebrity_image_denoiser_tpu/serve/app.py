"""HTTP server exposing the reference API contract.

Two deployments:
* ``make_server`` / ``run_server`` — stdlib ``ThreadingHTTPServer`` (no
  external web framework needed; requests serialize through the single
  TPU anyway, mirroring the reference's intentionally-sequential pipeline,
  page.tsx:123).
* ``create_fastapi_app`` — optional FastAPI factory with the identical
  routes, used when fastapi/uvicorn are installed.

Routes (reference backend/app.py:348-503):
    GET  /            → {"message", "models", "default_backends"}
    POST /enhance?model=...&cgan_backend=...  multipart: file, [label],
         [cond_file] → {"denoised_image_base64", "noise_graph_base64",
         "backend"} | {"detail"} with 400/500
    GET  /ui          → built-in web UI (frontend parity, serve/static)
    GET  /healthz     → liveness/readiness (framework addition)
    GET  /stats       → request counters / latency quantiles / compute-
                        backend routing (framework addition, serve/stats.py)
    GET  /metrics     → the same aggregates in Prometheus text exposition
                        format (framework addition)
CORS is wide-open like the reference (app.py:27-30).
"""

from __future__ import annotations

import json
import os
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from celebrity_image_denoiser_tpu.serve.handlers import (
    MAX_UPLOAD,
    EnhanceError,
    ServeState,
    run_enhance,
)
from celebrity_image_denoiser_tpu.serve.multipart import parse_multipart
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.serve.http")

_CORS = {
    "Access-Control-Allow-Origin": "*",
    "Access-Control-Allow-Methods": "*",
    "Access-Control-Allow-Headers": "*",
    "Access-Control-Allow-Credentials": "true",
}


def _ui_html() -> str:
    path = os.path.join(os.path.dirname(__file__), "static", "index.html")
    with open(path) as f:
        return f.read()


def make_server(host: str = "0.0.0.0", port: int = 8000,
                state: Optional[ServeState] = None,
                weights_dir: Optional[str] = None) -> ThreadingHTTPServer:
    st = state or ServeState(weights_dir=weights_dir)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            logger.info("%s " + fmt, self.client_address[0], *args)

        def _send(self, status: int, payload, content_type="application/json"):
            body = (json.dumps(payload) if content_type == "application/json"
                    else payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            for k, v in _CORS.items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_OPTIONS(self):
            self._send(200, {})

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/":
                self._send(200, st.info())
            elif parsed.path == "/healthz":
                self._send(200, st.healthz())
            elif parsed.path == "/stats":
                self._send(200, st.stats.snapshot())
            elif parsed.path == "/metrics":
                self._send(200, st.stats.prometheus(),
                           content_type="text/plain; version=0.0.4")
            elif parsed.path == "/ui":
                self._send(200, _ui_html(), content_type="text/html")
            else:
                self._send(404, {"detail": "Not Found"})

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path != "/enhance":
                self._send(404, {"detail": "Not Found"})
                return
            qs = urllib.parse.parse_qs(parsed.query)
            model = (qs.get("model", [""])[0] or "").strip()
            try:
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                except ValueError:
                    raise EnhanceError(400, "Invalid Content-Length")
                # bound BEFORE buffering: the 50 MB contract check inside
                # enhance() sees only the decoded file part — without this,
                # an 8 GB Content-Length allocates the whole body per
                # request thread before any check runs.  Headroom covers
                # multipart framing + the cGAN cond_file second part.
                # Negative values must 400 too: rfile.read(-1) would buffer
                # an unbounded stream until the client closes.
                if length < 0:
                    raise EnhanceError(400, "Invalid Content-Length")
                if length > 2 * MAX_UPLOAD + 65536:
                    raise EnhanceError(400, "File too large")
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if not ctype.startswith("multipart/form-data"):
                    raise EnhanceError(400, "Expected multipart/form-data")
                try:
                    parts = parse_multipart(body, ctype)
                except ValueError as e:
                    # malformed framing is the CLIENT's fault: 400, never a
                    # model 500 (fuzz contract, tests/test_multipart_fuzz.py)
                    raise EnhanceError(400, f"Malformed multipart body: {e}")
                if "file" not in parts:
                    raise EnhanceError(400, "Uploaded file must be an image")
                fpart = parts["file"]
                cond = parts.get("cond_file")
                result = run_enhance(
                    st,
                    model=model,
                    file_bytes=fpart.data,
                    content_type=fpart.content_type or "",
                    cgan_backend=qs.get("cgan_backend", ["auto"])[0],
                    # "replace" so undecodable label bytes become a 400 at
                    # int() parsing, not a UnicodeDecodeError 500
                    label_raw=(parts["label"].data.decode("utf-8", "replace")
                               if "label" in parts else None),
                    cond_bytes=cond.data if cond else None,
                    graphs_raw=qs.get("graphs", ["true"])[0],
                )
            except EnhanceError as e:
                # errors raised before run_enhance (bad multipart, missing
                # file) haven't been counted yet — run_enhance marks the
                # ones it already recorded
                if not getattr(e, "_stats_recorded", False):
                    st.stats.record_error(model, e.status)
                self._send(e.status, {"detail": e.detail})
                return
            except Exception as e:
                if not getattr(e, "_stats_recorded", False):
                    st.stats.record_error(model, 500)
                logger.error("Enhancement failed: %s", e, exc_info=True)
                self._send(500, {"detail": "Image enhancement failed"})
                return
            # the success write sits OUTSIDE the counting try: a client
            # that disconnects before the response lands (BrokenPipeError
            # here) got a successful enhancement, not a model:500 — the
            # exception propagates to http.server's own handler
            self._send(200, result)

    server = ThreadingHTTPServer((host, port), Handler)
    server.state = st
    return server


def run_server(host: str = "0.0.0.0", port: int = 8000,
               weights_dir: Optional[str] = None,
               state: Optional[ServeState] = None,
               precompile=None) -> None:
    state = state or ServeState(weights_dir=weights_dir)
    if precompile:
        state.warmup(tuple(precompile))
    server = make_server(host, port, state=state)
    logger.info("Unified GAN API listening on %s:%d", host, port)
    server.serve_forever()


def create_fastapi_app(weights_dir: Optional[str] = None,
                       state: Optional[ServeState] = None,
                       precompile=None):
    """FastAPI variant (optional dependency)."""
    from fastapi import FastAPI, File, Form, HTTPException, UploadFile
    from fastapi.exceptions import RequestValidationError
    from fastapi.middleware.cors import CORSMiddleware
    from fastapi.responses import HTMLResponse

    st = state or ServeState(weights_dir=weights_dir)
    if precompile:
        st.warmup(tuple(precompile))
    app = FastAPI(title="Unified GAN API (Denoise / cGAN / SRGAN / ESRGAN)")
    app.add_middleware(CORSMiddleware, allow_origins=["*"],
                       allow_credentials=True, allow_methods=["*"],
                       allow_headers=["*"])

    @app.get("/")
    async def root():
        return st.info()

    @app.get("/ui", response_class=HTMLResponse)
    async def ui():
        return _ui_html()

    @app.get("/healthz")
    async def healthz():
        return st.healthz()

    @app.get("/stats")
    async def stats():
        return st.stats.snapshot()

    @app.get("/metrics")
    async def metrics():
        from fastapi.responses import PlainTextResponse

        return PlainTextResponse(st.stats.prometheus(),
                                 media_type="text/plain; version=0.0.4")

    @app.exception_handler(RequestValidationError)
    async def _count_validation_errors(request, exc):
        # exactly-once parity with the stdlib front end: failures raised
        # BEFORE run_enhance (missing file field / model param) must reach
        # the error counters on this stack too.  The 422 status itself is
        # FastAPI's contract and stays.
        from fastapi.encoders import jsonable_encoder
        from fastapi.responses import JSONResponse

        model = (request.query_params.get("model") or "").strip()
        st.stats.record_error(model, 422)
        return JSONResponse(status_code=422,
                            content={"detail": jsonable_encoder(exc.errors())})

    @app.post("/enhance")
    async def enhance(model: str, file: UploadFile = File(...),
                      cgan_backend: str = "auto", graphs: str = "true",
                      label: Optional[str] = Form(default=None),
                      cond_file: Optional[UploadFile] = File(default=None)):
        # label arrives as a raw string so a bad value 400s exactly like the
        # stdlib server (FastAPI's int coercion would 422 instead)
        import functools

        from starlette.concurrency import run_in_threadpool

        file_bytes = await file.read()
        cond_bytes = await cond_file.read() if cond_file else None
        try:
            # the enhance path blocks (device compute, matplotlib, and the
            # micro-batcher's window sleep/Event wait) — run it off the
            # event loop or concurrent requests could never coalesce
            return await run_in_threadpool(functools.partial(
                run_enhance,
                st,
                model=model,
                file_bytes=file_bytes,
                content_type=file.content_type or "",
                cgan_backend=cgan_backend,
                label_raw=label,
                cond_bytes=cond_bytes,
                graphs_raw=graphs,
            ))
        except EnhanceError as e:
            raise HTTPException(status_code=e.status, detail=e.detail)

    return app
