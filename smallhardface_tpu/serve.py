"""HTTP detection service: persistent TPU detector behind a threaded
HTTP server.

The reference had no serving story (batch eval only); this serves the same
detect() pipeline — fused whole-pyramid device program, flip TTA, host
vote — as an endpoint:

  POST /detect?thresh=0.05   body: JPEG/PNG bytes
      → {"count": N, "detections": [[x1, y1, x2, y2, score], ...]}
  GET  /healthz              → {"status": "ok", ...}

Concurrent requests overlap: the device dispatch happens under a short
lock, the host-side readback + vote runs outside it, so one request's
host work overlaps the next one's device compute (same pattern as the
eval pipeline in test_runner).

Usage:
  python -m smallhardface_tpu.serve --conf configs/smallhardface.toml \
      --model /path/to/final.npz [--port 8400] [--host 127.0.0.1]
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger(__name__)


class DetectorService:
    """Thread-safe wrapper over TPUDetector's async pipeline.

    batch_window_ms > 0 turns on cross-client micro-batching: requests
    arriving within the window are grouped and same-bucket images run as
    ONE batched device program (detect_many) — the large-batch lever a
    v5e wants (2.7× per image at B=4 on-chip, PERF_NOTES.md) that the
    per-request pipeline can't reach. Detections are numerically
    equivalent to the unbatched path (tests/test_serve.py). max_batch
    bounds images per dispatch (a full-pyramid image peaks ~1.2 GiB HBM
    — B=4 measures 4.9 GiB at WIDER shapes, scripts/hbm_probe.py)."""

    # generous per-request bound: must exceed the documented worst-case
    # cold start (~300 s compile + up to 10 min first tunnel readback,
    # CLAUDE.md) with margin; a dead batch thread surfaces as an error
    # instead of a forever-blocked client
    REQUEST_TIMEOUT_S = 30 * 60

    def __init__(self, params, spec, batch_window_ms=0, max_batch=4,
                 calib_images=()):
        """calib_images: image paths for one-time int8 activation-range
        calibration (TPU.PRECISION='int8'); without them the service
        runs dynamic per-tensor scales, which are ~2x slower and warned
        about (the eval workers auto-calibrate; serving must be given
        representative images explicitly)."""
        from smallhardface_tpu.config import cfg
        from smallhardface_tpu.detect import TPUDetector
        spatial_mesh = None
        k = int(cfg.TPU.SPATIAL_DEVICES)
        if k > 1:
            # each request's image runs H-sharded across the first k
            # local devices (latency / HBM lever for large images, same
            # semantics as test_runner's grouped eval)
            if float(batch_window_ms) > 0:
                raise ValueError(
                    "TPU.SPATIAL_DEVICES > 1 is incompatible with "
                    "--batch-window-ms (detect_many batches per chip); "
                    "use per-request serving for spatially-sharded images")
            import jax
            from jax.sharding import Mesh
            from smallhardface_tpu.parallel.mesh import SPATIAL_AXIS
            local = jax.local_devices()
            if k > len(local):
                # fail at construction — make_spatial_mesh would clamp
                # to fewer devices and silently lose the HBM/latency
                # headroom this setting exists to provide
                raise ValueError(
                    f"TPU.SPATIAL_DEVICES={k} exceeds the "
                    f"{len(local)} local devices")
            spatial_mesh = Mesh(np.array(local[:k]), (SPATIAL_AXIS,))
        self.det = TPUDetector(params, spec, spatial_mesh=spatial_mesh)
        if self.det.compute_dtype == "int8":
            if calib_images:
                self.det.calibrate_int8(list(calib_images))
            else:
                logger.warning(
                    "TPU.PRECISION='int8' without --calib-images: serving "
                    "with dynamic per-tensor scales (~2x slower than the "
                    "calibrated chained mode, PERF_NOTES); pass "
                    "representative images to calibrate at startup")
        self._dispatch_lock = threading.Lock()
        self.batch_window = float(batch_window_ms) / 1e3
        self.max_batch = int(max_batch)
        self._queue = None
        if self.batch_window > 0:
            import queue
            self._queue = queue.Queue()
            threading.Thread(target=self._batch_loop, daemon=True).start()

    def warmup(self, shape=(480, 640)):
        import cv2
        im = np.zeros((*shape, 3), np.uint8)
        self.detect(cv2.imencode(".jpg", im)[1].tobytes())

    def detect(self, image_bytes, thresh=0.05):
        import cv2
        arr = np.frombuffer(image_bytes, np.uint8)
        im = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        if im is None:
            raise ValueError("could not decode image")
        if self._queue is not None:
            ev, slot = threading.Event(), {}
            self._queue.put((im, float(thresh), ev, slot))
            if not ev.wait(self.REQUEST_TIMEOUT_S):
                raise RuntimeError(
                    "detection service unavailable: batched request not "
                    f"served within {self.REQUEST_TIMEOUT_S}s")
            if "error" in slot:
                raise slot["error"]
            return slot["dets"]
        if self.det.host_preproc:
            # reference-exact parity path: detect() honors HOST_PREPROC;
            # detect_async would silently run the fused device path
            with self._dispatch_lock:
                return self.det.detect(im, thresh)[0][0]
        with self._dispatch_lock:
            handle = self.det.detect_async(im, thresh)
        dets = self.det.finalize_async(handle, thresh)[0]
        return dets

    def _batch_loop(self):
        import queue
        import time
        while True:
            batch = [self._queue.get()]
            # any failure anywhere in this iteration must release every
            # collected waiter — an escaped exception would kill the
            # daemon thread and strand all queued clients
            try:
                deadline = time.time() + self.batch_window
                while len(batch) < self.max_batch:
                    left = deadline - time.time()
                    if left <= 0:
                        break
                    try:
                        batch.append(self._queue.get(timeout=left))
                    except queue.Empty:
                        break
                by_thresh = {}
                for item in batch:
                    by_thresh.setdefault(item[1], []).append(item)
                for thresh, items in by_thresh.items():
                    try:
                        with self._dispatch_lock:
                            results = self.det.detect_many(
                                [it[0] for it in items], thresh,
                                max_batch=self.max_batch)
                        for (_, _, ev, slot), dets in zip(items, results):
                            slot["dets"] = dets[0]
                            ev.set()
                    except Exception as e:   # surface to this group
                        for _, _, ev, slot in items:
                            if not ev.is_set():
                                slot["error"] = e
                                ev.set()
            except Exception as e:           # pragma: no cover — backstop
                logger.exception("batch loop failure")
                for _, _, ev, slot in batch:
                    if not ev.is_set():
                        slot["error"] = e
                        ev.set()


def make_handler(service):
    class Handler(BaseHTTPRequestHandler):
        # bounds rfile reads so a client declaring a longer Content-Length
        # than it sends cannot pin a handler thread forever
        timeout = 60

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                import jax
                self._json(200, {"status": "ok",
                                 "backend": jax.default_backend(),
                                 "devices": jax.local_device_count()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/detect"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                from urllib.parse import urlparse, parse_qs
                qs = parse_qs(urlparse(self.path).query)
                thresh = float(qs.get("thresh", ["0.05"])[0])
                if "chunked" in (self.headers.get("Transfer-Encoding")
                                 or "").lower():
                    self._json(411, {"error": "Content-Length required"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    self._json(400, {"error": "empty body"})
                    return
                data = self.rfile.read(length)
                if len(data) < length:
                    self._json(400, {"error": "truncated body"})
                    return
                dets = service.detect(data, thresh)
                self._json(200, {
                    "count": int(dets.shape[0]),
                    "detections": np.round(dets, 3).tolist(),
                })
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:          # pragma: no cover
                logger.exception("detect failed")
                self._json(500, {"error": str(e)})

        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.client_address[0], *args)

    return Handler


def serve(service, host="127.0.0.1", port=8400):
    server = ThreadingHTTPServer((host, port), make_handler(service))
    logger.info("serving on %s:%d", host, port)
    return server


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--conf", default="")
    p.add_argument("--model", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--batch-window-ms", type=float, default=0,
                   help="cross-client micro-batch window; 0 = per-request")
    p.add_argument("--max-batch", type=int, default=4,
                   help="images per batched dispatch (B=4 measures "
                        "4.9 GiB peak HBM at WIDER shapes)")
    p.add_argument("--calib-images", nargs="*", default=[],
                   help="representative images for one-time int8 "
                        "activation calibration (TPU.PRECISION='int8'); "
                        "omitting them serves the slower dynamic mode")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    from smallhardface_tpu.config import cfg, cfg_from_file
    if args.conf:
        cfg_from_file(args.conf)
    if args.model:
        cfg.TEST.MODEL = args.model

    import jax
    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.test_runner import _load_params
    spec = dm.build_spec(cfg)
    params = _load_params(spec)
    service = DetectorService(params, spec,
                              batch_window_ms=args.batch_window_ms,
                              max_batch=args.max_batch,
                              calib_images=args.calib_images)
    logger.info("warming up...")
    service.warmup()
    server = serve(service, args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
