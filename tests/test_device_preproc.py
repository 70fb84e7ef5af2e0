"""Device-fused preprocessing (resize/mean-sub/flip/pad on device) must
match the host cv2 path within float-vs-fixed-point resize tolerance."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu.detect import TPUDetector


@pytest.fixture
def small_cfg():
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TEST.N_DETS_PER_MODULE, cfg.TPU.HOST_PREPROC,
           cfg.TPU.MERGED_DET_CAP, cfg.TPU.VOTE_CAP)
    cfg.TEST.SCALES = [60, 110]
    cfg.TEST.FLIP = True
    cfg.TPU.TEST_BUCKET = 64
    # caps high enough that neither path truncates (random-weight inputs
    # score ~0.5 everywhere, unlike trained models)
    cfg.TEST.N_DETS_PER_MODULE = 5000
    cfg.TPU.MERGED_DET_CAP = -1
    cfg.TPU.VOTE_CAP = 8192
    yield
    (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
     cfg.TEST.N_DETS_PER_MODULE, cfg.TPU.HOST_PREPROC,
     cfg.TPU.MERGED_DET_CAP, cfg.TPU.VOTE_CAP) = old


def test_device_resize_matches_cv2():
    """The fused scale_and_translate resize reproduces cv2.resize's
    explicit-fx convention (sampling with 1/fx, dst dims rounded)."""
    rng = np.random.RandomState(0)
    im = rng.randint(0, 255, (75, 99, 3), dtype=np.uint8)
    for s in (0.37, 0.8, 1.6):
        want = cv2.resize(im.astype(np.float32), None, fx=s, fy=s,
                          interpolation=cv2.INTER_LINEAR)
        hs, ws = want.shape[:2]
        got = jax.image.scale_and_translate(
            jnp.asarray(im, jnp.float32), (hs, ws, 3), (0, 1),
            scale=jnp.asarray([s, s]),
            translation=jnp.zeros(2),
            method="linear", antialias=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=0.6)


def test_device_vs_host_detections(small_cfg):
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(1)
    im = rng.randint(0, 255, (90, 130, 3), dtype=np.uint8)

    cfg.TPU.HOST_PREPROC = True
    det_host = TPUDetector(params, spec)
    host_dets = det_host.detect(im, thresh=0.05)[0][0]

    cfg.TPU.HOST_PREPROC = False
    det_dev = TPUDetector(params, spec)
    dev_dets = det_dev.detect(im, thresh=0.05)[0][0]

    # same number of final (voted) detections and near-identical geometry;
    # order by coordinates, not score — near-tied scores (fp32 device vote
    # vs float64 host vote) would flip a score-primary sort. The two
    # pipelines preprocess differently (device resize vs cv2), so vote
    # clusters at the exact IoU boundary may flip on noise inputs: allow
    # ≤2% divergent rows. Exact same-pipeline vote parity is asserted in
    # test_nms_device.py::test_detector_device_vote_matches_host.
    assert host_dets.shape == dev_dets.shape
    if host_dets.shape[0]:
        def iou_matrix(a, b):
            xx1 = np.maximum(a[:, None, 0], b[None, :, 0])
            yy1 = np.maximum(a[:, None, 1], b[None, :, 1])
            xx2 = np.minimum(a[:, None, 2], b[None, :, 2])
            yy2 = np.minimum(a[:, None, 3], b[None, :, 3])
            inter = (np.maximum(0, xx2 - xx1 + 1) *
                     np.maximum(0, yy2 - yy1 + 1))
            ar = lambda d: (d[:, 2] - d[:, 0] + 1) * (d[:, 3] - d[:, 1] + 1)
            return inter / (ar(a)[:, None] + ar(b)[None, :] - inter)

        iou = iou_matrix(host_dets, dev_dets)
        best = iou.argmax(axis=1)
        matched = (iou[np.arange(len(best)), best] > 0.9) & (
            np.abs(host_dets[:, 4] - dev_dets[best, 4]) < 0.01)
        assert matched.mean() >= 0.97, (
            f"{(~matched).sum()}/{matched.size} host detections have no "
            "device counterpart")


def test_exact_mode_matches_where(small_cfg):
    """TPU.MASK_MODE="exact" (shape-exact programs, forward fully
    unmasked) must produce the same detections as "where" (bucketed +
    re-zeroed padding): inside-valid values are identical by the masking
    contract, and nothing downstream reads beyond valid. Same device
    pipeline on both sides, so the comparison is strict."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    rng = np.random.RandomState(3)
    im = rng.randint(0, 255, (90, 130, 3), dtype=np.uint8)

    old_mode = cfg.TPU.MASK_MODE
    try:
        cfg.TPU.MASK_MODE = "where"
        where_dets = TPUDetector(params, spec).detect(im, thresh=0.05)[0][0]

        cfg.TPU.MASK_MODE = "exact"
        det = TPUDetector(params, spec)
        exact_dets = det.detect(im, thresh=0.05)[0][0]
        # exact mode keys per-shape programs: buckets == valid extents,
        # no margin, mask_mode in the key
        p = det._prep(im)
        assert p["key"][5] == "exact"
        for (hb, wb), vh, vw in zip(p["key"][2], p["vh"], p["vw"]):
            assert hb == vh * dm.FEAT_STRIDE and wb == vw * dm.FEAT_STRIDE
    finally:
        cfg.TPU.MASK_MODE = old_mode

    assert where_dets.shape == exact_dets.shape
    if where_dets.shape[0]:
        order_w = np.lexsort(where_dets.T)
        order_e = np.lexsort(exact_dets.T)
        np.testing.assert_allclose(
            where_dets[order_w], exact_dets[order_e], rtol=1e-4, atol=2e-3)
