"""Training data pipeline: per-replica sampling, augmentation, minibatch
building, and the hard-image-mining feedback channel.

Host-side rebuild of RoIDataLayer + minibatch
(/root/reference/lib/roi_data_layer/layer.py, minibatch.py,
 lib/utils/blob.py):

  - aspect-ratio-grouped shuffling with a per-replica permutation
    (layer.py:16-51); epoch reshuffle honoring skip/prob flags written by
    the easy-image miner (layer.py:37-50)
  - single image per replica step; random short-side scale from
    TRAIN.SCALES.SHORT_SIDE capped at MAX_SIZE (blob.py:35-70) — the scale
    index is chosen once per step by the train loop so all replicas share a
    compiled shape bucket
  - photometric distortion (brightness/contrast/saturation/hue in the
    reference's exact order and probability structure, blob.py:73-120)
  - random crop 0.6-1.0 with ≥1-face-center enforcement, 50 tries
    (minibatch.py:100-146)
  - images return unpadded; the train loop pads the global batch to a
    shared bucket shape

Deviation from the reference: augmentation randomness comes from a
per-replica numpy RandomState(RNG_SEED + rank) instead of the forked global
state, making runs reproducible per replica.
"""

from __future__ import annotations

import logging
import threading

import cv2
import numpy as np

from smallhardface_tpu.config import cfg

logger = logging.getLogger(__name__)


def _distortion(im, rng):
    """Photometric augmentation on the float BGR image (blob.py:73-120)."""
    aug = cfg.TRAIN.AUGMENT

    def brightness(x):
        if rng.rand() < aug.BRIGHTNESS.PROB:
            delta = rng.uniform(-aug.BRIGHTNESS.DELTA, aug.BRIGHTNESS.DELTA)
            x = np.clip(x + delta, 0.0, 255.0)
        return x

    def contrast(x):
        if rng.rand() < aug.CONTRAST.PROB:
            alpha = rng.uniform(aug.CONTRAST.LOWER, aug.CONTRAST.UPPER)
            x = np.clip(x * alpha, 0.0, 255.0)
        return x

    def saturation(hsv):
        if rng.rand() < aug.SATURATION.PROB:
            alpha = rng.uniform(aug.SATURATION.LOWER, aug.SATURATION.UPPER)
            hsv[..., 1] = np.clip(hsv[..., 1] * alpha, 0.0, 1.0)
        return hsv

    def hue(hsv):
        if rng.rand() < aug.HUE.PROB:
            delta = rng.uniform(-aug.HUE.DELTA, aug.HUE.DELTA)
            hsv[..., 0] = (hsv[..., 0] + delta) % 360.0
        return hsv

    im = brightness(im)
    if rng.randint(2):
        im = contrast(im)
        hsv = cv2.cvtColor(im, cv2.COLOR_BGR2HSV)
        hsv = hue(saturation(hsv))
        im = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    else:
        hsv = cv2.cvtColor(im, cv2.COLOR_BGR2HSV)
        hsv = hue(saturation(hsv))
        im = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        im = contrast(im)
    return np.clip(np.round(im), 0.0, 255.0)


def _sample_crop(img_h, img_w, gt_boxes, rng):
    """Sample a random crop window keeping ≥1 face center inside
    (minibatch.py:100-146) — pure box geometry, no pixels touched (the
    actual crop fuses into the device resize). Returns
    (hs, ws, height, width, transformed gt) or None when no feasible
    window is found."""
    aug = cfg.TRAIN.AUGMENT.CROP
    found = False
    for _ in range(aug.MAX_TRIES):
        wr = rng.uniform(aug.LOWER, aug.UPPER)
        hr = rng.uniform(aug.LOWER, aug.UPPER)
        height = int(np.clip(np.round(img_h * hr), 0, img_h))
        width = int(np.clip(np.round(img_w * wr), 0, img_w))
        hs = rng.randint(img_h - height + 1)
        ws = rng.randint(img_w - width + 1)
        if aug.KEEP_ONLY_CENTER_INSIDE:
            xc = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
            yc = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
            inside = np.where((xc >= ws) & (xc < ws + width) &
                              (yc >= hs) & (yc < hs + height))[0]
        else:
            inside = np.where(
                (np.clip(gt_boxes[:, 0], ws, None) <
                 np.clip(gt_boxes[:, 2], None, ws + width)) &
                (np.clip(gt_boxes[:, 1], hs, None) <
                 np.clip(gt_boxes[:, 3], None, hs + height)))[0]
        if (not aug.POSITIVE_ENFORCE) or inside.size > 0:
            found = True
            break
    if not found:
        return None
    gt = gt_boxes[inside].copy()
    gt[:, [0, 2]] = np.clip(gt[:, [0, 2]] - ws, 0.0, width)
    gt[:, [1, 3]] = np.clip(gt[:, [1, 3]] - hs, 0.0, height)
    return hs, ws, height, width, gt


class RoIDataLoader:
    """Per-replica sampler + minibatch builder with epoch-level skip/prob
    feedback (the RoIDataLayer role)."""

    def __init__(self, roidb, rank=0):
        self.rank = rank
        self._roidb = roidb
        # two independent streams: self.rng feeds the (single) fetch
        # thread's sampling/augmentation; the feedback stream feeds
        # mark_easy, which the MAIN thread calls concurrently — separate
        # streams keep the per-replica fetch RNG reproducible
        self.rng = np.random.RandomState(int(cfg.RNG_SEED) + rank)
        self._feedback_rng = np.random.RandomState(
            int(cfg.RNG_SEED) + rank + 7919)
        # per-replica mining state: the reference forked one process per
        # GPU, so skip/prob flags were rank-private (lib/train.py:249-258);
        # the shared roidb here stays read-only and flags live locally
        self._mining = {}          # im_idx -> {"prob": p} or {"skip": k}
        # the lock guards _perm/_cur/_mining, which the fetch thread and
        # the main thread (mark_easy) both touch
        self._lock = threading.Lock()
        self._shuffle()

    def _shuffle(self):
        roidb = self._roidb
        if cfg.TRAIN.ASPECT_GROUPING:
            widths = np.array([r["width"] for r in roidb])
            heights = np.array([r["height"] for r in roidb])
            horz_inds = np.where(widths >= heights)[0]
            vert_inds = np.where(widths < heights)[0]
            inds = np.hstack((self.rng.permutation(horz_inds),
                              self.rng.permutation(vert_inds)))
            n_pairs = len(inds) // 2
            pairs = inds[:n_pairs * 2].reshape(-1, 2)
            row_perm = self.rng.permutation(np.arange(n_pairs))
            inds = np.concatenate(
                [pairs[row_perm].reshape(-1), inds[n_pairs * 2:]])
            self._perm = list(inds)
        else:
            self._perm = list(self.rng.permutation(len(roidb)))
        skipped = []
        if cfg.TRAIN.DISABLE_EASY_IMAGE.SMOOTH:
            for i, m in self._mining.items():
                if "prob" in m and self.rng.rand() < m["prob"]:
                    skipped.append(i)
        else:
            for i, m in self._mining.items():
                if m.get("skip", 0) >= 1:
                    skipped.append(i)
                    m["skip"] -= 1
        if skipped:
            skipset = set(skipped)
            self._perm = [i for i in self._perm if i not in skipset]
            logger.warning("%d images disabled, %d images left, rank: %d",
                           len(skipped), len(self._perm), self.rank)
        self._cur = 0

    def _next_index(self):
        with self._lock:
            if self._cur >= len(self._perm):
                logger.info("New epoch, rank: %d", self.rank)
                self._shuffle()
            idx = self._perm[self._cur]
            self._cur += 1
            return idx

    def state_dict(self):
        """Snapshot the sampler: RNG streams, permutation cursor, and
        mining flags. Together with the weights/optimizer checkpoint this
        makes resume bit-reproducible in the data stream (exceeds the
        reference, which restarted its data layers from scratch).

        Easy-image marks: the train loop drains the in-flight metrics of
        the pipelined iterations BEFORE capturing this snapshot on
        snapshot iterations (train_loop will_snap branch), so the
        captured mining state carries every mark for iterations ≤ the
        snapshot iteration and the replayed stream cannot lose marks at
        resume."""
        import copy
        with self._lock:
            return {
                "rng": self.rng.get_state(),
                "feedback_rng": self._feedback_rng.get_state(),
                "perm": list(self._perm),
                "cur": int(self._cur),
                "mining": copy.deepcopy(self._mining),
            }

    def load_state_dict(self, state):
        with self._lock:
            self.rng.set_state(state["rng"])
            self._feedback_rng.set_state(state["feedback_rng"])
            self._perm = list(state["perm"])
            self._cur = int(state["cur"])
            self._mining = dict(state["mining"])

    def mark_easy(self, im_idx):
        """Easy-image feedback from the device step
        (multi_layer_anchor_layer.py:329-338). State is rank-private."""
        dei = cfg.TRAIN.DISABLE_EASY_IMAGE
        if not dei.ENABLE:
            return
        with self._lock:
            if dei.SMOOTH:
                self._mining.setdefault(im_idx, {})["prob"] = dei.PROB
            elif self._feedback_rng.rand() <= dei.PROB:
                self._mining.setdefault(im_idx, {})["skip"] = np.inf
                logger.warning("%d ignored at rank: %d", im_idx, self.rank)

    def get_minibatch(self, scale_idx):
        """Build one training sample at the given scale index.

        Host work stops at the distorted uint8 ORIGINAL: the resize to the
        training scale and the random crop fuse into the device step
        (scale_and_translate with translation = -crop offset), so no
        megapixel cv2.resize runs on the host and the upload is the
        original image. gt boxes ship already transformed to the final
        (resized, cropped) frame.

        Returns dict: data (h0, w0, 3) uint8 original, gt_boxes (G, 5),
        im_scale, crop (hs, ws) in resized coords, im_idx, height, width
        (the FINAL post-crop extent driving bucket/valid shapes)."""
        mode = cfg.TRAIN.SCALES.MODE
        assert mode in ("SHORT_SIDE", "FACE_AREA"), \
            f"Unknown TRAIN.SCALES.MODE: {mode}"
        idx = self._next_index()
        entry = self._roidb[idx]
        im = cv2.imread(entry["image"])
        assert im is not None, f"Failed to read {entry['image']}"
        if entry["flipped"]:
            im = im[:, ::-1, :]

        im = im.astype(np.float32)
        if cfg.TRAIN.AUGMENT.ENABLE:
            im = _distortion(im, self.rng)
        # NOTE: pixel-mean subtraction happens ON DEVICE (train step), so
        # the batch ships as uint8 (4× less host→device traffic). The
        # reference subtracts before resizing (blob.py:45), but bilinear
        # resize commutes with constant subtraction; the only deviation is
        # ≤0.5-intensity rounding of the resized image, far below the
        # photometric augmentation noise (brightness ±32).

        target_size = cfg.TRAIN.SCALES.SHORT_SIDE[scale_idx]
        size_min = min(im.shape[:2])
        size_max = max(im.shape[:2])
        if cfg.TRAIN.ORIG_SIZE:
            im_scale = 1.0
        else:
            if mode == "SHORT_SIDE":
                im_scale = float(target_size) / size_min
            else:
                # FACE_AREA: median face area → target (blob.py:54-55)
                b = entry["boxes"]
                face_median = float(np.median(
                    (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])))
                if not np.isfinite(face_median) or face_median == 0:
                    im_scale = 1.0
                else:
                    im_scale = float(np.sqrt(target_size / face_median))
            if np.round(im_scale * size_max) > cfg.TRAIN.SCALES.MAX_SIZE:
                im_scale = float(cfg.TRAIN.SCALES.MAX_SIZE) / size_max
        # Downscales resize on the HOST (the resized image is SMALLER than
        # the original, so shipping it minimizes the upload and keeps the
        # compiled original-shape set bounded by the scale buckets);
        # upscales ship the original and resize on device (the original is
        # the minimal representation). Either way the device step sees
        # (data, ship_scale, crop) with cv2 fx-sampling semantics.
        ship_scale = im_scale
        if im_scale < 1.0:
            im = cv2.resize(im, None, None, fx=im_scale, fy=im_scale,
                            interpolation=cv2.INTER_LINEAR)
            ship_scale = 1.0
        # resized extent with cv2's dst-rounding convention (the device
        # resize samples at 1/ship_scale, identical to cv2.resize fx=)
        hr = int(round(im.shape[0] * ship_scale))
        wr = int(round(im.shape[1] * ship_scale))

        gt_inds = np.where(entry["gt_classes"] != 0)[0]
        gt = np.zeros((len(gt_inds), 5), dtype=np.float32)
        gt[:, :4] = entry["boxes"][gt_inds] * im_scale
        gt[:, 4] = entry["gt_classes"][gt_inds]

        hs = ws = 0
        height, width = hr, wr
        if (cfg.TRAIN.AUGMENT.ENABLE and
                self.rng.rand() < cfg.TRAIN.AUGMENT.CROP.PROB):
            crop = _sample_crop(hr, wr, gt, self.rng)
            if crop is not None:
                hs, ws, height, width, gt = crop

        with self._lock:
            self._mining.setdefault(idx, {}).setdefault(
                "seen_scale", []).append(im_scale)
        data = np.ascontiguousarray(
            np.clip(np.round(im), 0, 255), dtype=np.uint8)
        return {
            "data": data,
            "gt_boxes": gt,
            "im_scale": float(ship_scale),
            "crop": (hs, ws),
            "im_idx": idx,
            "height": height,
            "width": width,
        }
