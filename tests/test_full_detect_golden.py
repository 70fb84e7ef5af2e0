"""Full-pipeline detection oracle + golden fixture (AP-parity pre-staging).

With no network egress (the reference final.caffemodel is unreachable),
the next-best oracle for the WHOLE detect() path is an independent
implementation: torch float64 forward (tests/test_torch_parity.py) +
reference-exact host preprocessing (cv2 resize at every pyramid scale,
flip TTA) + numpy decode (ops/bbox_np) + float64 bbox_vote — i.e. the
reference pipeline (lib/test.py:109-217) reconstructed from independent
parts. Its detections on a fixed real image with fixed weights are checked
in as tests/golden_detect.npz; the routine test drives the production
TPUDetector (fused device preprocessing + device vote) against the fixture.

Regenerate the fixture (≈ minutes of float64 CPU):
    RUN_TORCH_ORACLE=1 python -m pytest tests/test_full_detect_golden.py -q
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu.ops import anchors as anchors_mod
from smallhardface_tpu.ops import bbox_np, nms_np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_detect.npz")

SCALES = [100, 300]
THRESH = 0.05


@pytest.fixture
def golden_cfg():
    saved_test = {k: cfg.TEST[k] for k in
                  ("SCALES", "FLIP", "NMS_METHOD", "NMS_THRESH",
                   "SCORE_THRESH", "N_DETS_PER_MODULE")}
    saved_tpu = {k: cfg.TPU[k] for k in ("VOTE_CAP", "TEST_BUCKET",
                                         "DEVICE_VOTE", "HOST_PREPROC")}
    cfg.TEST.SCALES = list(SCALES)
    cfg.TEST.FLIP = True
    cfg.TEST.NMS_METHOD = "BBOX_VOTE"
    cfg.TEST.NMS_THRESH = 0.4
    cfg.TEST.SCORE_THRESH = 0.002
    cfg.TEST.N_DETS_PER_MODULE = 10000
    cfg.TPU.VOTE_CAP = 16384
    cfg.TPU.TEST_BUCKET = 128
    cfg.TPU.DEVICE_VOTE = True
    cfg.TPU.HOST_PREPROC = False
    yield
    cfg.TEST.update(saved_test)
    cfg.TPU.update(saved_tpu)


def _fixture_inputs():
    import cv2
    im = cv2.imread(os.path.join(REPO, "demo", "demo.jpg"))
    assert im is not None
    im = cv2.resize(im, (200, 160), interpolation=cv2.INTER_AREA)
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(7), spec)
    # bias the heads toward background for a moderate detection count
    for k in (1, 2, 4):
        params[f"cls_score_{k}"]["b"] = jnp.asarray([1.2, -1.2])
    return im, spec, params


def _oracle_detect(params, im, spec):
    """Reference-protocol detection, fully independent of the JAX path."""
    import cv2
    import torch
    from tests.test_torch_parity import _torch_forward
    from smallhardface_tpu.detect import compute_scaling_factor

    base_anchors = anchors_mod.generate_anchors(
        base_size=16, ratios=[1], scales=list(dm.ANCHOR_SCALES),
        shifts=[0], strides=[dm.FEAT_STRIDE] * 3)
    base_scale = compute_scaling_factor(
        im.shape, cfg.TEST.PYRAMID_BASE_SIZE[0],
        cfg.TEST.PYRAMID_BASE_SIZE[1])
    pyramid = [s / cfg.TEST.PYRAMID_BASE_SIZE[0] * base_scale
               for s in SCALES]
    cap = int(cfg.TEST.N_DETS_PER_MODULE)

    im_f = im.astype(np.float32) - np.asarray(cfg.PIXEL_MEANS, np.float32)
    all_boxes, all_scores = [], []
    for scale in pyramid:
        resized = cv2.resize(im_f, None, None, fx=scale, fy=scale,
                             interpolation=cv2.INTER_LINEAR)
        h, w = resized.shape[:2]
        h16 = int(math.ceil(h / 16) * 16)
        w16 = int(math.ceil(w / 16) * 16)
        for flipped in (False, True):
            img = resized[:, ::-1] if flipped else resized
            x = np.zeros((1, h16, w16, 3), np.float32)
            x[0, :h, :w] = img
            cls, box = _torch_forward(
                params, torch.from_numpy(x.transpose(0, 3, 1, 2)).double(),
                spec)
            # stable softmax over the (bg, fg) logits
            m = cls.max(axis=-1, keepdims=True)
            e = np.exp(cls - m)
            probs = (e[..., 1] / e.sum(axis=-1))[0]         # (h8, w8, A)
            h8, w8, A = probs.shape
            anchors = anchors_mod.dense_anchors(
                h8, w8, dm.FEAT_STRIDE, base_anchors)       # (h8*w8*A, 4)
            boxes = bbox_np.bbox_transform_inv(
                anchors, box[0].reshape(-1, 4).astype(np.float64))
            boxes = bbox_np.clip_boxes(boxes, (h, w))
            scores = probs.reshape(-1)
            n_above = int((scores >= cfg.TEST.SCORE_THRESH).sum())
            n_keep = min(max(n_above, 1), cap)
            order = np.argsort(-scores)[:n_keep]
            bx, sc = boxes[order].copy(), scores[order]
            if flipped:
                x1 = w - bx[:, 2]
                x2 = w - bx[:, 0]
                bx[:, 0], bx[:, 2] = x1, x2
            bx /= scale
            all_boxes.append(bx)
            all_scores.append(sc)
    boxes = np.concatenate(all_boxes)
    probs = np.concatenate(all_scores)
    keep = probs > THRESH
    dets = np.hstack([boxes[keep], probs[keep, None]]).astype(np.float32)
    return nms_np.bbox_vote(dets, cfg.TEST.NMS_THRESH)


def _match_fraction(a, b):
    """Fraction of rows in `a` with an IoU>0.9, |Δscore|<0.01 partner in
    `b`."""
    if len(a) == 0:
        return 1.0 if len(b) == 0 else 0.0
    iou = bbox_np.bbox_overlaps(a[:, :4], b[:, :4])
    best = iou.argmax(axis=1)
    ok = (iou[np.arange(len(a)), best] > 0.9) & (
        np.abs(a[:, 4] - b[best, 4]) < 0.01)
    return float(ok.mean())


@pytest.mark.skipif(os.environ.get("RUN_TORCH_ORACLE") != "1",
                    reason="float64 torch oracle takes minutes on 1 core; "
                           "set RUN_TORCH_ORACLE=1 to regenerate the fixture")
def test_regenerate_golden_from_oracle(golden_cfg):
    im, spec, params = _fixture_inputs()
    dets = _oracle_detect(params, im, spec)
    np.savez(GOLDEN, dets=dets.astype(np.float32))
    assert dets.shape[0] > 5, "oracle produced too few detections"


def test_full_detect_bfloat16_drift_bounded(golden_cfg):
    """TPU.PRECISION='bfloat16' end-to-end drift vs the float64-oracle
    fixture, quantified: detections must still correspond 1:1 at a loose
    IoU/score tolerance. (The tight fp32 bound lives in
    test_full_detect_matches_golden; bf16 activations carry ~1e-2 relative
    noise through 15 convs, which moves near-threshold scores.)

    Measured on this fixture: ~95% of golden detections have a bf16
    counterpart, ~82% the other way — the random-init weights are the
    WORST case (scores cluster at the detect threshold where bf16 noise
    flips membership, spawning borderline extras); a trained model's
    bimodal scores drift far less. Bounds set with margin below the
    measured values to catch real regressions, not noise."""
    if not os.path.exists(GOLDEN):
        pytest.skip("golden_detect.npz not generated yet")
    golden = np.load(GOLDEN)["dets"]
    im, spec, params = _fixture_inputs()
    saved = cfg.TPU.PRECISION
    cfg.TPU.PRECISION = "bfloat16"
    try:
        from smallhardface_tpu.detect import TPUDetector
        dets = TPUDetector(params, spec).detect(im, thresh=THRESH)[0][0]
    finally:
        cfg.TPU.PRECISION = saved

    def loose_match(a, b):
        if len(a) == 0:
            return 1.0 if len(b) == 0 else 0.0
        iou = bbox_np.bbox_overlaps(a[:, :4], b[:, :4])
        best = iou.argmax(axis=1)
        ok = (iou[np.arange(len(a)), best] > 0.6) & (
            np.abs(a[:, 4] - b[best, 4]) < 0.1)
        return float(ok.mean())

    assert abs(dets.shape[0] - golden.shape[0]) <= max(
        3, 0.15 * golden.shape[0])
    assert loose_match(golden, dets) >= 0.85
    assert loose_match(dets, golden) >= 0.75


def test_full_detect_matches_golden(golden_cfg):
    """Production fused-device pipeline vs the independent oracle fixture:
    every golden detection must have a device counterpart and vice versa."""
    if not os.path.exists(GOLDEN):
        pytest.skip("golden_detect.npz not generated yet "
                    "(RUN_TORCH_ORACLE=1)")
    golden = np.load(GOLDEN)["dets"]
    im, spec, params = _fixture_inputs()
    from smallhardface_tpu.detect import TPUDetector
    dets = TPUDetector(params, spec).detect(im, thresh=THRESH)[0][0]
    assert abs(dets.shape[0] - golden.shape[0]) <= max(
        2, 0.02 * golden.shape[0])
    assert _match_fraction(golden, dets) >= 0.97
    assert _match_fraction(dets, golden) >= 0.97
