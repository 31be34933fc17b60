"""HTTP serving daemon over the recompile-free dynamic predictors.

The reference has no serving layer at all (SURVEY §1: its deploy surface
is batch eval drivers, ``eval_lut_sr.py`` / ``eval_model.py``); this
daemon completes the production-deploy story the dynamic forms were
built for: one long-lived process holds the compiled dynamic programs —
program identity is (shape, output-shape) only, or (shape-bucket,
output-bucket) with ``granularity>0`` — so a request stream of arbitrary
scales, homographies, and image sizes NEVER triggers an XLA recompile
after warmup.

stdlib-only: ``http.server`` for transport, PIL (already a data-layer
dependency) for image codecs, raw ``.npy``/``.npz`` for bit-exact
clients.

Endpoints
  GET  /healthz
      → ``{"ok": true, "backend": "tpu", "form": "...", "served": N}``
  POST /v1/upscale?scale=4 | scale=1.5x2.0
      body: png/jpeg (any PIL format) or application/x-npy uint8 HWC
      → image/png, or application/x-npy when the request body was npy
        (npy in → npy out is bit-exact to ``upscale_dynamic``)
  POST /v1/warp?matrix=a,b,c,d,e,f,g,h,i&outSize=HxW[&format=npz]
      → image/png of the masked output (out-of-view pixels black, the
        eval-driver convention, eval_lut_warp.py:197-233) with header
        ``X-Lerf-Mask-Coverage``; ``format=npz`` returns the raw
        ``{out, mask}`` pair instead.
  POST /v1/upscale_batch?scale=S
      body: application/x-npy uint8 [B, H, W, 3]
      → application/x-npy uint8 [B, oH, oW, 3]; bit-exact to
        ``upscale_batch`` (one device program for the whole batch —
        the small-frame amortization path, BASELINE "batched warp").
  POST /v1/warp_batch?outSize=HxW
      body: application/x-npz with ``imgs`` uint8 [B, H, W, 3] and
      ``matrices`` float64 [B, 3, 3] (or one [3, 3] broadcast to all)
      → application/x-npz ``{out, mask}`` from ``warp_batch``.

Concurrency: requests decode/encode in their own threads
(``ThreadingHTTPServer``); device work is funneled through the async
predictor API under a dispatch lock — the lock covers only host
precompute + dispatch, so frame k+1's decode and geometry precompute
overlap frame k's device execution and D2H copy, exactly like the
bounded-queue engine (`engine.py`).
"""
from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["make_server"]


class _TooLarge(Exception):
    """Request body exceeds the configured cap (→ HTTP 413)."""


def _parse_scale(s: str):
    if "x" in s:
        sh, sw = (float(v) for v in s.split("x"))
        return sh, sw
    return float(s), float(s)


def _parse_matrix(s: str) -> np.ndarray:
    vals = [float(v) for v in s.split(",")]
    if len(vals) != 9:
        raise ValueError("matrix needs 9 comma-separated floats")
    return np.asarray(vals, np.float64).reshape(3, 3)


def _decode_image(body: bytes, ctype: str):
    """→ (uint8 HWC image, came_as_npy)."""
    if "npy" in ctype:
        arr = np.load(io.BytesIO(body), allow_pickle=False)
        if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(
                f"npy body must be uint8 [H, W, 3], got {arr.dtype} "
                f"{arr.shape}")
        return arr, True
    from PIL import Image

    try:
        return np.array(Image.open(io.BytesIO(body)).convert("RGB")), False
    except OSError as e:
        # PIL's UnidentifiedImageError (an OSError) on malformed image
        # bodies is a CLIENT error; convert here so do_POST doesn't have
        # to catch OSError broadly (which would mislabel server-side I/O
        # faults as 400s)
        raise ValueError(f"undecodable image body: {e}")


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class _State:
    def __init__(self, pred, granularity: int, max_inflight: int,
                 max_body_bytes: int, geometry: str = "host"):
        self.pred = pred
        self.granularity = granularity
        # "device" routes /v1/warp through warp_device_async (in-program
        # rings from the 3×3 inverse — 36 B matrix operand, no host
        # geometry pass; README "Choosing a serving form")
        if geometry not in ("host", "device"):
            raise ValueError(
                f"geometry={geometry!r}: must be 'host' or 'device'")
        self.geometry = geometry
        self.max_body_bytes = max_body_bytes
        self.dispatch_lock = threading.Lock()
        # bounds dispatched-not-yet-fetched frames (each holds its device
        # output buffers until the D2H fetch) — the daemon analog of the
        # streaming engine's queue depth
        self.inflight = threading.Semaphore(max_inflight)
        # guards the stats below: request threads append/increment
        # concurrently, and /healthz iterates the deques — an unlocked
        # deque mutated mid-iteration raises RuntimeError
        self.stats_lock = threading.Lock()
        self.served = 0
        # sliding latency window (seconds): dispatch = host precompute +
        # async device dispatch under the lock; total = + device + fetch
        self.lat_dispatch = deque(maxlen=256)
        self.lat_total = deque(maxlen=256)

    def record(self, dispatch_s=None, total_s=None, served=False):
        with self.stats_lock:
            if dispatch_s is not None:
                self.lat_dispatch.append(dispatch_s)
            if total_s is not None:
                self.lat_total.append(total_s)
            if served:
                self.served += 1

    def percentiles(self, samples):
        with self.stats_lock:
            samples = list(samples)
        if not samples:
            return {}
        ms = sorted(1e3 * s for s in samples)
        return {"p50_ms": round(ms[len(ms) // 2], 2),
                "p99_ms": round(ms[min(len(ms) - 1,
                                       int(len(ms) * 0.99))], 2),
                "n": len(ms)}


def _build_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        # one daemon serves many short requests; keep-alive default
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _send(self, code: int, payload: bytes, ctype: str,
                  extra=()):
            self._response_started = True
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(payload)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                import jax

                self._send_json(200, {
                    "ok": True,
                    "backend": jax.default_backend(),
                    "form": type(state.pred).__name__,
                    "granularity": state.granularity,
                    "served": state.served,
                    "dispatch": state.percentiles(state.lat_dispatch),
                    "total": state.percentiles(state.lat_total),
                })
            elif path == "/":
                self._send(200, __doc__.encode(), "text/plain")
            else:
                self._send_json(404, {"error": f"no route {path}"})

        def _read_body(self):
            n = int(self.headers.get("Content-Length", "0"))
            if n <= 0:
                raise ValueError("empty request body")
            if n > state.max_body_bytes:
                raise _TooLarge(
                    f"body of {n} bytes exceeds the "
                    f"{state.max_body_bytes}-byte limit")
            return self.rfile.read(n)

        def do_POST(self):
            # per-request: the handler instance lives for the whole
            # keep-alive connection
            self._response_started = False
            url = urlparse(self.path)
            q = {k: v[-1] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/v1/upscale_batch":
                    self._upscale_batch(self._read_body(), q)
                elif url.path == "/v1/warp_batch":
                    self._warp_batch(self._read_body(), q)
                elif url.path in ("/v1/upscale", "/v1/warp"):
                    img, as_npy = _decode_image(
                        self._read_body(),
                        self.headers.get("Content-Type", ""))
                    if url.path == "/v1/upscale":
                        self._upscale(img, as_npy, q)
                    else:
                        self._warp(img, as_npy, q)
                else:
                    self._send_json(404, {"error": f"no route {url.path}"})
                    return
                state.record(served=True)
            except _TooLarge as e:
                # the oversized body was never read — close the connection
                # (reading N hundred MB just to keep keep-alive alive would
                # be the DoS we're avoiding; Connection: close makes the
                # client resync instead of the server desyncing on reuse)
                self.close_connection = True
                self._send_json(413, {"error": str(e)})
            except (ValueError, KeyError) as e:
                # malformed-image OSErrors are converted to ValueError at
                # the decode site; a bare OSError here is a server-side
                # I/O fault (or a mid-response disconnect) and belongs to
                # the 500 path below
                self._send_json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — keep-alive must survive
                # an unexpected failure must produce an HTTP response (and
                # keep the long-lived daemon's connection usable), never a
                # dead thread and a dropped connection.  But if the fault
                # struck MID-response (status/partial body already on the
                # wire — e.g. a client disconnect during a large PNG
                # write), injecting a second response would corrupt the
                # stream: close instead.
                if getattr(self, "_response_started", False):
                    # leave a trace: a dropped connection with no log line
                    # would make real server-side faults undiagnosable
                    try:
                        self.log_error("mid-response fault: %s: %s",
                                       type(e).__name__, e)
                    except Exception:   # noqa: BLE001 — logging must not raise
                        pass
                    self.close_connection = True
                    return
                try:
                    self._send_json(500, {
                        "error": f"{type(e).__name__}: {e}"})
                except OSError:
                    pass  # client already gone; nothing to report to

        def _upscale(self, img, as_npy, q):
            sh, sw = _parse_scale(q.get("scale", "4"))
            t0 = time.perf_counter()
            with state.inflight:
                with state.dispatch_lock:  # host precompute+dispatch only
                    fut = state.pred.upscale_dynamic_async(
                        img, sh, sw, granularity=state.granularity)
                    state.record(dispatch_s=time.perf_counter() - t0)
                out = fut.result()         # device compute + D2H, unlocked
            state.record(total_s=time.perf_counter() - t0)
            if as_npy:
                self._send(200, _npy_bytes(out), "application/x-npy")
            else:
                self._send(200, _png_bytes(out), "image/png")

        def _warp(self, img, as_npy, q):
            matrix = _parse_matrix(q["matrix"])
            try:
                oh, ow = (int(v) for v in q["outSize"].split("x"))
            except ValueError:
                raise ValueError("outSize must be HxW, e.g. 512x512")
            t0 = time.perf_counter()
            use_devgeo = (state.geometry == "device"
                          and hasattr(state.pred, "warp_device_async"))
            with state.inflight:
                with state.dispatch_lock:
                    if use_devgeo:
                        fut = state.pred.warp_device_async(
                            img, matrix, (oh, ow),
                            granularity=state.granularity)
                    else:
                        fut = state.pred.warp_dynamic_async(
                            img, matrix, (oh, ow),
                            granularity=state.granularity)
                    state.record(dispatch_s=time.perf_counter() - t0)
                out, mask = fut.result()
            state.record(total_s=time.perf_counter() - t0)
            if q.get("format") == "npz":
                buf = io.BytesIO()
                np.savez(buf, out=out, mask=np.asarray(mask))
                self._send(200, buf.getvalue(), "application/x-npz")
                return
            mask = np.asarray(mask)
            cov = float(mask.mean())
            masked = out * mask.astype(out.dtype)[..., None]
            payload = (_npy_bytes(masked) if as_npy else _png_bytes(masked))
            self._send(200, payload,
                       "application/x-npy" if as_npy else "image/png",
                       extra=(("X-Lerf-Mask-Coverage", f"{cov:.6f}"),))

        def _upscale_batch(self, body, q):
            imgs = np.load(io.BytesIO(body), allow_pickle=False)
            if isinstance(imgs, np.lib.npyio.NpzFile):
                # np.load returns an NpzFile for .npz bodies; without this
                # branch the .dtype access below AttributeErrors into a 500
                imgs.close()
                raise ValueError(
                    "body must be a single .npy array (uint8 [B, H, W, 3]); "
                    "for .npz batched warp use /v1/warp_batch")
            if imgs.dtype != np.uint8 or imgs.ndim != 4 \
                    or imgs.shape[-1] != 3:
                raise ValueError(
                    f"npy body must be uint8 [B, H, W, 3], got "
                    f"{imgs.dtype} {imgs.shape}")
            sh, sw = _parse_scale(q.get("scale", "4"))
            t0 = time.perf_counter()
            # upscale_batch is synchronous (one program for the whole
            # batch); hold the dispatch lock across it — the batch IS the
            # amortization, there is no per-frame overlap to exploit
            with state.inflight, state.dispatch_lock:
                out = state.pred.upscale_batch(imgs, sh, sw)
            state.record(total_s=time.perf_counter() - t0)
            self._send(200, _npy_bytes(out), "application/x-npy")

        def _warp_batch(self, body, q):
            z = np.load(io.BytesIO(body), allow_pickle=False)
            if not isinstance(z, np.lib.npyio.NpzFile):
                # a plain .npy body yields an ndarray, which is not a
                # context manager — map to 400, not a TypeError 500
                raise ValueError(
                    "body must be an .npz archive with 'imgs' uint8 "
                    "[B, H, W, 3] and 'matrices' float [B, 3, 3] (or "
                    "[3, 3]); a plain .npy array is not accepted here")
            with z:
                if "imgs" not in z or "matrices" not in z:
                    raise ValueError(
                        "npz body must contain 'imgs' uint8 [B, H, W, 3] "
                        "and 'matrices' float [B, 3, 3] (or [3, 3])")
                imgs, matrices = z["imgs"], z["matrices"]
            if imgs.dtype != np.uint8 or imgs.ndim != 4 \
                    or imgs.shape[-1] != 3:
                raise ValueError(
                    f"'imgs' must be uint8 [B, H, W, 3], got "
                    f"{imgs.dtype} {imgs.shape}")
            if matrices.shape not in ((3, 3), (imgs.shape[0], 3, 3)):
                # a mismatched batch would otherwise IndexError (500) or
                # silently truncate to the first B matrices
                raise ValueError(
                    f"'matrices' must be [3, 3] or [{imgs.shape[0]}, 3, 3] "
                    f"to match imgs, got {matrices.shape}")
            try:
                oh, ow = (int(v) for v in q["outSize"].split("x"))
            except ValueError:
                raise ValueError("outSize must be HxW, e.g. 512x512")
            t0 = time.perf_counter()
            with state.inflight, state.dispatch_lock:
                out, mask = state.pred.warp_batch(imgs, matrices, (oh, ow))
            state.record(total_s=time.perf_counter() - t0)
            buf = io.BytesIO()
            np.savez(buf, out=out, mask=np.asarray(mask))
            self._send(200, buf.getvalue(), "application/x-npz")

    return Handler


def make_server(pred, *, host: str = "127.0.0.1", port: int = 0,
                granularity: int = 0, max_inflight: int = 8,
                max_body_bytes: int = 256 << 20,
                geometry: str = "host") -> ThreadingHTTPServer:
    """Build (but do not start) the daemon; ``port=0`` picks a free port
    (``server.server_address[1]`` reports it).  ``granularity>0`` buckets
    input/output shapes so heterogeneous request streams share programs
    (pipeline.upscale_dynamic / warp_dynamic semantics, bit-identical).
    ``max_inflight`` caps dispatched-not-yet-fetched frames so a burst of
    concurrent clients cannot queue unbounded output buffers in HBM;
    ``max_body_bytes`` (default 256 MB — an 8K uint8 RGB frame is ~100 MB)
    rejects larger uploads with 413 before buffering them.
    ``geometry="device"`` serves /v1/warp through the in-program-geometry
    form (``warp_device_async``) — for hosts whose link makes the rings
    operand upload the bottleneck; Gaussian LUT/net deploy configs only
    (others keep the host path)."""
    state = _State(pred, granularity, max_inflight, max_body_bytes,
                   geometry=geometry)
    server = ThreadingHTTPServer((host, port), _build_handler(state))
    server.lerf_state = state
    return server
