"""HTTP serving endpoint: real socket round-trip on the CPU mesh."""

import json
import threading
import urllib.request
import urllib.error

import numpy as np
import cv2
import jax
import pytest

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu import serve as serve_mod


@pytest.fixture(scope="module")
def server():
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TEST.N_DETS_PER_MODULE)
    cfg.TEST.SCALES = [50, 90]
    cfg.TEST.FLIP = True
    cfg.TPU.TEST_BUCKET = 64
    cfg.TEST.N_DETS_PER_MODULE = 100
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    service = serve_mod.DetectorService(params, spec)
    srv = serve_mod.serve(service, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
     cfg.TEST.N_DETS_PER_MODULE) = old


def _jpeg(shape=(96, 128)):
    im = np.random.RandomState(0).randint(0, 255, (*shape, 3), np.uint8)
    return cv2.imencode(".jpg", im)[1].tobytes()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        payload = json.loads(r.read())
    assert payload["status"] == "ok"
    assert payload["devices"] >= 1


def test_detect_roundtrip(server):
    req = urllib.request.Request(f"{server}/detect?thresh=0.05",
                                 data=_jpeg(), method="POST")
    with urllib.request.urlopen(req) as r:
        payload = json.loads(r.read())
    assert payload["count"] == len(payload["detections"])
    assert payload["count"] >= 1
    for det in payload["detections"][:5]:
        assert len(det) == 5


def test_detect_bad_body(server):
    req = urllib.request.Request(f"{server}/detect",
                                 data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400


def test_concurrent_requests(server):
    results = []

    def hit():
        req = urllib.request.Request(f"{server}/detect", data=_jpeg(),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            results.append(json.loads(r.read())["count"])

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert len(set(results)) == 1      # same image → same count


def test_micro_batching_matches_per_request(server):
    """Cross-client micro-batching (batch_window_ms>0) groups concurrent
    requests into one detect_many dispatch and returns detections
    numerically equivalent to the per-request path."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    plain = serve_mod.DetectorService(params, spec)
    batched = serve_mod.DetectorService(params, spec,
                                        batch_window_ms=120, max_batch=4)
    payloads = [_jpeg((96, 128)), _jpeg((96, 128)), _jpeg((64, 96))]
    want = [plain.detect(p) for p in payloads]

    got = [None] * len(payloads)

    def hit(i):
        got[i] = batched.detect(payloads[i])

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for w, g in zip(want, got):
        assert w.shape == g.shape
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-4)

    # decode errors must surface to the right caller, not hang the loop
    with pytest.raises(ValueError):
        batched.detect(b"not an image")


def test_spatial_serving_matches_plain():
    """TPU.SPATIAL_DEVICES=4: the service shards each request's image
    across a 4-device group; detections match plain per-device serving
    to last-ulp reassociation. batch-window micro-batching is rejected
    (detect_many batches per chip)."""
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TPU.SPATIAL_DEVICES)
    cfg.TEST.SCALES = [50]
    cfg.TEST.FLIP = False
    cfg.TPU.TEST_BUCKET = 64
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(0), spec)
        body = _jpeg()
        cfg.TPU.SPATIAL_DEVICES = 1
        plain = serve_mod.DetectorService(params, spec).detect(body)
        cfg.TPU.SPATIAL_DEVICES = 4
        sp = serve_mod.DetectorService(params, spec).detect(body)
        assert sp.shape == plain.shape
        np.testing.assert_allclose(sp, plain, rtol=1e-5, atol=1e-4)
        with pytest.raises(ValueError, match="incompatible"):
            serve_mod.DetectorService(params, spec, batch_window_ms=5)
    finally:
        (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
         cfg.TPU.SPATIAL_DEVICES) = old


def test_int8_serving_calibrates_at_startup(tmp_path):
    """TPU.PRECISION='int8' + --calib-images: the service builds a static
    qstate at construction (the chained fast path) and serves; without
    calib images it stays dynamic (warned) but still serves."""
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TPU.PRECISION, cfg.TPU.MASK_MODE)
    cfg.TEST.SCALES = [48]
    cfg.TEST.FLIP = False
    cfg.TPU.TEST_BUCKET = 64
    cfg.TPU.PRECISION = "int8"
    cfg.TPU.MASK_MODE = "where"
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(0), spec)
        im = np.random.RandomState(1).randint(0, 255, (60, 90, 3), np.uint8)
        path = str(tmp_path / "calib.jpg")
        cv2.imwrite(path, im)
        body = cv2.imencode(".jpg", im)[1].tobytes()
        svc = serve_mod.DetectorService(params, spec, calib_images=[path])
        assert svc.det.qstate is not None
        dets = svc.detect(body)
        assert dets.ndim == 2 and dets.shape[1] == 5
        dyn = serve_mod.DetectorService(params, spec)     # warned, dynamic
        assert dyn.det.qstate is None
        assert dyn.detect(body).shape[1] == 5
    finally:
        (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
         cfg.TPU.PRECISION, cfg.TPU.MASK_MODE) = old
