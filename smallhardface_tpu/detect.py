"""Per-image detection: multi-scale pyramid + flip TTA + merge + vote.

TPU-native rebuild of /root/reference/lib/test.py:21-217:
  - pyramid scale factors: base_scale fits PYRAMID_BASE_SIZE, then
    SCALES/800 × base_scale (lib/test.py:130-139)
  - per scale: mean-subtract, cv2 INTER_LINEAR resize on host
    (lib/utils/test_utils.py:29-46), pad to ×MAX_RESOLUTION (lib/test.py:34-38)
  - flip TTA runs as a batch of 2 in the same jitted forward (the reference
    ran a second sequential forward, lib/test.py:147-155)
  - the whole forward + softmax + decode + top-k runs on device with static
    shapes; images are padded up to TPU.TEST_BUCKET multiples so the pyramid
    reuses a bounded set of compiled programs
  - merge across (scale × flip), threshold, then BBOX_VOTE (or plain NMS) on
    host (lib/test.py:161-217)
"""

from __future__ import annotations

import logging
import math

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as detector_mod
from smallhardface_tpu.ops import anchors as anchors_mod
from smallhardface_tpu.ops import decode as decode_mod
from smallhardface_tpu.ops import nms_np
from smallhardface_tpu.utils.timer import Timer

logger = logging.getLogger(__name__)


def compute_scaling_factor(im_shape, target_size, max_size):
    """Short side → target_size, long side capped at max_size
    (/root/reference/lib/utils/test_utils.py:8-26)."""
    if cfg.TEST.ORIG_SIZE:
        return 1.0
    im_size_min = float(np.min(im_shape[0:2]))
    im_size_max = float(np.max(im_shape[0:2]))
    im_scale = float(target_size) / im_size_min
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / im_size_max
    return im_scale


def _round_up(x, m):
    return int(math.ceil(x / m) * m)


class TPUDetector:
    """Holds params + a cache of jitted (bucketed-shape) forward programs."""

    def __init__(self, params, spec=None, device=None):
        self.spec = spec or detector_mod.build_spec(cfg)
        self.device = device
        if device is not None:
            params = jax.device_put(params, device)
        self.params = params
        self.base_anchors = anchors_mod.generate_anchors(
            base_size=16, ratios=[1],
            scales=list(detector_mod.ANCHOR_SCALES),
            shifts=[0],
            strides=[detector_mod.FEAT_STRIDE] * 3)
        cap = int(cfg.TPU.DET_CAPACITY)
        self.capacity = cap if cap > 0 else int(cfg.TEST.N_DETS_PER_MODULE)
        self._compiled = {}
        precision = cfg.TPU.PRECISION
        self.compute_dtype = (jnp.bfloat16 if precision == "bfloat16"
                              else None)

    def _program(self, shape):
        """Jitted forward+decode for a (B, H, W) padded shape."""
        if shape in self._compiled:
            return self._compiled[shape]
        spec = self.spec
        base_anchors = self.base_anchors
        capacity = self.capacity
        cd = self.compute_dtype

        def run(params, x, im_h, im_w, valid_h, valid_w, min_size,
                score_thresh):
            out = detector_mod.forward(params, x, spec, compute_dtype=cd)
            probs = jax.nn.softmax(out["cls_logits"], axis=-1)[..., 1]

            def one(p, d):
                return decode_mod.decode_proposals(
                    p, d, base_anchors,
                    feat_stride=detector_mod.FEAT_STRIDE,
                    im_h=im_h, im_w=im_w,
                    valid_h=valid_h, valid_w=valid_w,
                    score_thresh=score_thresh, min_size=min_size,
                    capacity=capacity)

            return jax.vmap(one)(probs, out["bbox_deltas"])

        fn = jax.jit(run)
        self._compiled[shape] = fn
        return fn

    def forward_scale(self, ims, im_h, im_w, score_thresh=None):
        """Run one pyramid level. ims: list of HWC float32 mean-subtracted
        images of identical (im_h, im_w) (e.g. [image, flipped image]).
        Returns (boxes (B, cap, 4), scores (B, cap), counts (B,)) numpy.
        """
        b = len(ims)
        h16 = _round_up(im_h, cfg.MAX_RESOLUTION)
        w16 = _round_up(im_w, cfg.MAX_RESOLUTION)
        bucket = max(int(cfg.TPU.TEST_BUCKET), cfg.MAX_RESOLUTION)
        hb = _round_up(h16, bucket)
        wb = _round_up(w16, bucket)
        x = np.zeros((b, hb, wb, 3), dtype=np.float32)
        for i, im in enumerate(ims):
            x[i, :im_h, :im_w] = im
        fn = self._program((b, hb, wb))
        xd = jnp.asarray(x)
        if self.device is not None:
            xd = jax.device_put(xd, self.device)
        boxes, scores, counts = fn(
            self.params, xd,
            jnp.float32(im_h), jnp.float32(im_w),
            jnp.int32(h16 // detector_mod.FEAT_STRIDE),
            jnp.int32(w16 // detector_mod.FEAT_STRIDE),
            jnp.float32(0.0),
            jnp.float32(score_thresh if score_thresh is not None
                        else cfg.TEST.SCORE_THRESH))
        return (np.asarray(boxes), np.asarray(scores),
                np.asarray(counts))

    def detect(self, im, thresh=0.05, timers=None):
        """Full-pyramid detection on one BGR uint8 image (or path).

        Returns a list with one (N, 5) [x1,y1,x2,y2,score] array per
        foreground class (single 'face' class here), like the reference
        detect() (/root/reference/lib/test.py:109-178).
        """
        if timers is None:
            timers = {"detect": Timer(), "misc": Timer()}
        if isinstance(im, str):
            im = cv2.imread(im)
        timers["detect"].tic()

        im_f = im.astype(np.float32) - np.asarray(cfg.PIXEL_MEANS,
                                                  dtype=np.float32)
        scales = list(cfg.TEST.SCALES)
        if len(scales) == 1:
            # single-scale: short side → SCALES[0] capped at MAX_SIZE
            # (reference non-pyramid path, lib/test.py:118-121)
            pyramid_scales = [
                compute_scaling_factor(im.shape, scales[0], cfg.TEST.MAX_SIZE)
            ]
        else:
            base_scale = compute_scaling_factor(
                im.shape, cfg.TEST.PYRAMID_BASE_SIZE[0],
                cfg.TEST.PYRAMID_BASE_SIZE[1])
            pyramid_scales = [
                float(s) / cfg.TEST.PYRAMID_BASE_SIZE[0] * base_scale
                for s in scales
            ]

        all_boxes = []
        all_scores = []
        for scale in pyramid_scales:
            if scale == 1.0:
                resized = im_f
            else:
                resized = cv2.resize(im_f, None, None, fx=scale, fy=scale,
                                     interpolation=cv2.INTER_LINEAR)
            h, w = resized.shape[:2]
            ims = [resized]
            if cfg.TEST.FLIP:
                ims.append(resized[:, ::-1])
            boxes, scores, counts = self.forward_scale(ims, h, w)
            for i in range(len(ims)):
                n = int(counts[i])
                bx = boxes[i, :n].astype(np.float64)
                sc = scores[i, :n].astype(np.float64)
                if i == 1:  # flipped: mirror x in network-input space
                    x1 = w - bx[:, 2]
                    x2 = w - bx[:, 0]
                    bx[:, 0], bx[:, 2] = x1, x2
                bx /= scale
                all_boxes.append(bx)
                all_scores.append(sc)

        probs = np.concatenate(all_scores)
        boxes = np.concatenate(all_boxes)
        timers["detect"].toc()

        timers["misc"].tic()
        inds = np.where(probs > thresh)[0]
        dets = np.hstack(
            (boxes[inds], probs[inds, None])).astype(np.float32)
        if cfg.TEST.NMS_METHOD == "BBOX_VOTE":
            cls_dets = [nms_np.bbox_vote(dets, cfg.TEST.NMS_THRESH)]
        elif cfg.TEST.NMS_METHOD == "NMS":
            keep = nms_np.nms(dets, cfg.TEST.NMS_THRESH)
            cls_dets = [dets[keep, :]]
        else:
            raise NotImplementedError(
                f"Unknown NMS method: {cfg.TEST.NMS_METHOD}")
        timers["misc"].toc()
        return cls_dets, timers
