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
from jax import lax

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as detector_mod
from smallhardface_tpu.ops import anchors as anchors_mod
from smallhardface_tpu.ops import decode as decode_mod
from smallhardface_tpu.ops import native as nms_host
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


def _mask_plan():
    """(forward mask_mode, bucket margin px) for the configured
    TPU.MASK_MODE (models/detector.py forward docstring)."""
    return detector_mod.mask_plan(str(cfg.TPU.MASK_MODE))


def _pyramid_scales(im_shape):
    """Per-level resize factors for one image under the configured
    TEST.SCALES (single-scale: short-side rule; multi-scale: levels scale
    relative to the PYRAMID_BASE_SIZE fit — lib/test.py:130-137)."""
    scales = list(cfg.TEST.SCALES)
    if len(scales) == 1:
        return [compute_scaling_factor(im_shape, scales[0],
                                       cfg.TEST.MAX_SIZE)]
    base_scale = compute_scaling_factor(
        im_shape, cfg.TEST.PYRAMID_BASE_SIZE[0],
        cfg.TEST.PYRAMID_BASE_SIZE[1])
    return [float(s) / cfg.TEST.PYRAMID_BASE_SIZE[0] * base_scale
            for s in scales]


class TPUDetector:
    """Holds params + a cache of jitted (bucketed-shape) programs.

    Two execution modes:
      - device preprocessing (default): the raw uint8 image is uploaded
        ONCE per image; every pyramid level derives on device — float cast,
        mean subtraction, cv2-convention bilinear resize
        (out(o) = in((o+0.5)/fx - 0.5), exactly what cv2.resize does with an
        explicit fx), horizontal mirror for flip TTA, zero padding — fused
        into the forward+decode program. Host↔device traffic per image is
        one uint8 upload + a few KB of detections.
      - host preprocessing (cfg.TPU.HOST_PREPROC): cv2 resize on host and a
        float32 upload per scale, bit-matching the reference pipeline
        (lib/utils/test_utils.py:29-46) for parity debugging.
    """

    def __init__(self, params, spec=None, device=None, spatial_mesh=None):
        """spatial_mesh: optional Mesh from parallel.mesh.make_spatial_mesh
        — shards every pyramid level's H axis across the mesh so a single
        image's inference runs on multiple chips (XLA inserts the conv
        halo exchanges); detections match single-chip to last-ulp float
        reassociation around the exchanges (observed max 8e-6)."""
        self.spec = spec or detector_mod.build_spec(cfg)
        self.device = device
        self.spatial_mesh = spatial_mesh
        if spatial_mesh is not None:
            from smallhardface_tpu.parallel.mesh import replicate
            params = replicate(spatial_mesh, params)
        elif device is not None:
            params = jax.device_put(params, device)
        self.params = params
        self.base_anchors = anchors_mod.generate_anchors(
            base_size=16, ratios=[1],
            scales=list(detector_mod.ANCHOR_SCALES),
            shifts=[0],
            strides=[detector_mod.FEAT_STRIDE] * 3)
        cap = int(cfg.TPU.DET_CAPACITY)
        self.capacity = cap if cap > 0 else int(cfg.TEST.N_DETS_PER_MODULE)
        from collections import OrderedDict
        # LRU caches of compiled programs: serving workloads with diverse
        # client image sizes would otherwise grow these without bound
        # (each entry holds a compiled executable)
        self._compiled = OrderedDict()
        self._compiled_dev = OrderedDict()
        self._max_programs = 64
        precision = cfg.TPU.PRECISION
        self.compute_dtype = {"bfloat16": jnp.bfloat16,
                              "int8": "int8"}.get(str(precision))
        if (self.compute_dtype == "int8"
                and _mask_plan()[0] not in ("where", "exact")):
            # fail at construction, not trace time (the forward would
            # raise the same contract mid-jit — see models/detector.py)
            raise ValueError(
                "TPU.PRECISION='int8' requires TPU.MASK_MODE 'exact' or "
                "'where' (dynamic activation scales are global reduces; "
                f"'{cfg.TPU.MASK_MODE}' buckets carry garbage padding)")
        self.host_preproc = bool(cfg.TPU.HOST_PREPROC)
        if spatial_mesh is not None and self.host_preproc:
            # the host-preproc parity path jits without mesh shardings —
            # it would silently run unsharded on one device of the mesh
            raise ValueError(
                "spatial_mesh is incompatible with TPU.HOST_PREPROC "
                "(the reference-exact host path has no sharded program); "
                "unset one of them")
        # device-side final NMS/vote: only final detections cross D2H
        self.device_vote = (bool(cfg.TPU.DEVICE_VOTE)
                            and not self.host_preproc)
        self.vote_cap = int(cfg.TPU.VOTE_CAP)
        # static int8 quantization state (calibrate_int8); None = dynamic
        # per-tensor scales (slower — the max-reduce serializes)
        self.qstate = None

    def _decode_batch(self, out, im_h, im_w, valid_h, valid_w, min_size,
                      score_thresh, fast_k=0):
        probs = jax.nn.softmax(out["cls_logits"], axis=-1)[..., 1]
        return decode_mod.decode_proposals_batch(
            probs, out["bbox_deltas"], self.base_anchors,
            feat_stride=detector_mod.FEAT_STRIDE,
            im_h=im_h, im_w=im_w,
            valid_h=valid_h, valid_w=valid_w,
            score_thresh=score_thresh, min_size=min_size,
            capacity=self.capacity, fast_k=fast_k)

    def _build_run(self, level_buckets, flip, vote_method, _truncate=None,
                   fast_decode=True):
        """Build the fused whole-pyramid device function: every level
        (+flip batch) from one uploaded raw image, through forward, decode,
        merge, and (optionally) the device NMS/vote. Shared by the
        single-image program (jit) and detect_many's batched program
        (jit∘vmap).

        _truncate (tools/pyramid_time.py only): cut the program after
        "preproc" / "forward" / "decode", returning a scalar checksum that
        depends on everything computed so far — the instrument for
        attributing the fused program's wall per stage. None (production)
        is byte-identical to before the hook existed."""
        spec = self.spec
        cd = self.compute_dtype
        mean = jnp.asarray(cfg.PIXEL_MEANS, jnp.float32).reshape(1, 1, 3)

        merged_cap = int(cfg.TPU.MERGED_DET_CAP)
        vote_cap = self.vote_cap

        serial = bool(cfg.TPU.LEVEL_SERIAL)
        flip_split_px = int(cfg.TPU.FLIP_SPLIT_PX)
        # threshold-aware per-level top-k (ops/decode.py): disabled in the
        # batched program (fast_decode=False — under vmap the cond becomes
        # a select that pays both branches)
        fast_k = int(cfg.TPU.DECODE_FAST_K) if fast_decode else 0

        def run(params, qstate, raw_u8, inv_fx, h_s, w_s, valid_h, valid_w,
                score_thresh, final_thresh, nms_thresh):
            # per-level traced scalars arrive as stacked (L,) arrays
            img = raw_u8.astype(jnp.float32)
            all_boxes, all_scores = [], []
            for li, (hb, wb) in enumerate(level_buckets):
                sc = 1.0 / inv_fx[li]
                if serial and li > 0:
                    # Serialize the levels: tie this level's first op to the
                    # previous level's (tiny) outputs so the scheduler cannot
                    # interleave independent levels. Measured
                    # (scripts/hbm_probe.py, PERF_NOTES r4): peak HBM is
                    # UNCHANGED — XLA's scheduler already orders the levels
                    # memory-minimally (max-over-levels either way; batched
                    # B=4 peaks 4.9 GiB at WIDER shapes) — but pinning the
                    # order collapses the scheduler's search on the big
                    # batched programs: the B=4 pyramid compiles in 89 s vs
                    # 932 s without the barriers. optimization_barrier is
                    # the identity: detections are bit-identical
                    # (tests/test_detect_many.py).
                    sc, all_boxes[-1], all_scores[-1] = (
                        lax.optimization_barrier(
                            (sc, all_boxes[-1], all_scores[-1])))
                resized = jax.image.scale_and_translate(
                    img, (hb, wb, 3), (0, 1),
                    scale=jnp.stack([sc, sc]),
                    translation=jnp.zeros((2,), jnp.float32),
                    method="linear", antialias=False)
                resized = resized - mean
                ys = lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
                xs = lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
                valid = ((ys < h_s[li]) & (xs < w_s[li]))[..., None]
                resized = jnp.where(valid, resized, 0.0)
                ims = [resized]
                if flip:
                    idx = jnp.clip(w_s[li] - 1 - jnp.arange(wb), 0, wb - 1)
                    mirrored = jnp.take(resized, idx, axis=1)
                    ims.append(jnp.where(valid, mirrored, 0.0))
                x = jnp.stack(ims, axis=0)
                if _truncate == "preproc":
                    # checksum stands in for (boxes, scores) so the
                    # LEVEL_SERIAL barrier wiring above still applies
                    all_boxes.append(jnp.zeros((1, 4), jnp.float32))
                    all_scores.append(jnp.sum(x).reshape(1))
                    continue
                def _fwd(xx):
                    return detector_mod.forward(
                        params, xx, spec, compute_dtype=cd,
                        valid_hw=(valid_h[li] * detector_mod.FEAT_STRIDE,
                                  valid_w[li] * detector_mod.FEAT_STRIDE),
                        mask_mode=_mask_plan()[0],
                        s2d_stem=bool(cfg.TPU.S2D_STEM),
                        # under a spatial mesh the forward routes the stem
                        # through fused_stem_spatial (shard_map + halo
                        # exchange — the SPMD partitioner cannot split a
                        # Pallas custom call) when the level bucket's H
                        # divides n·8, and falls back to the XLA stem
                        # chain otherwise
                        pallas_stem=bool(cfg.TPU.PALLAS_STEM),
                        spatial_mesh=self.spatial_mesh,
                        qstate=qstate)

                if flip and hb * wb >= flip_split_px:
                    # big levels: TWO serial batch-1 forwards instead of
                    # one batch-2. Measured on the v5e (PERF_NOTES r5):
                    # batch-2 convs at the big pyramid buckets run at
                    # ~0.42 MFU vs 0.54-0.56 for batch-1 — two b1 passes
                    # cost 40 ms where one b2 pass costs 52 ms at
                    # 1536×1920. Below the threshold (the two smallest
                    # WIDER levels) batch-2 stays cheaper. The barrier
                    # serializes the passes so their activations never
                    # coexist (same HBM discipline as LEVEL_SERIAL).
                    out0 = _fwd(x[:1])
                    if serial:
                        tie = sum(jnp.sum(lf.astype(jnp.float32))
                                  for lf in
                                  jax.tree_util.tree_leaves(out0))
                        x1 = lax.optimization_barrier(
                            (x[1:], tie))[0]
                    else:
                        x1 = x[1:]
                    out1 = _fwd(x1)
                    out = jax.tree_util.tree_map(
                        lambda a, b: jnp.concatenate([a, b], axis=0),
                        out0, out1)
                else:
                    out = _fwd(x)
                if _truncate == "forward":
                    leaves = jax.tree_util.tree_leaves(out)
                    acc = sum(jnp.sum(lf.astype(jnp.float32))
                              for lf in leaves)
                    all_boxes.append(jnp.zeros((1, 4), jnp.float32))
                    all_scores.append(acc.reshape(1))
                    continue
                boxes, scores, counts = self._decode_batch(
                    out, h_s[li].astype(jnp.float32),
                    w_s[li].astype(jnp.float32),
                    valid_h[li], valid_w[li],
                    jnp.float32(0.0), score_thresh, fast_k=fast_k)
                # device-side merge: back to original-image space; mask
                # rows beyond each batch item's keep count
                slot = jnp.arange(boxes.shape[1])
                row_ok = slot[None, :] < counts[:, None]
                if flip:
                    ws_f = w_s[li].astype(jnp.float32)
                    mx1 = ws_f - boxes[1, :, 2]
                    mx2 = ws_f - boxes[1, :, 0]
                    flipped = jnp.stack(
                        [mx1, boxes[1, :, 1], mx2, boxes[1, :, 3]], axis=-1)
                    boxes = jnp.stack([boxes[0], flipped], axis=0)
                boxes = boxes * inv_fx[li]
                scores = jnp.where(row_ok, scores, -jnp.inf)
                all_boxes.append(boxes.reshape(-1, 4))
                all_scores.append(scores.reshape(-1))
            cat_boxes = jnp.concatenate(all_boxes, axis=0)
            cat_scores = jnp.concatenate(all_scores, axis=0)
            if _truncate in ("preproc", "forward"):
                return (jnp.sum(cat_scores).reshape(1, 1),
                        jnp.int32(0))
            if _truncate == "decode":
                return ((jnp.sum(cat_boxes) + jnp.sum(
                    jnp.where(jnp.isfinite(cat_scores), cat_scores, 0.0))
                ).reshape(1, 1), jnp.int32(0))
            total = cat_scores.shape[0]
            # final host-level threshold (strictly greater, lib/test.py:163)
            keep = cat_scores > final_thresh
            if vote_method is not None:
                # device-side final stage: top-K above-threshold detections
                # enter the merge; only merged clusters cross D2H
                from smallhardface_tpu.ops import nms_jax
                sortable = jnp.where(keep, cat_scores, -jnp.inf)
                k = min(vote_cap, total)
                top_scores, top_idx = lax.top_k(sortable, k)
                n_above = jnp.minimum(keep.sum(), k).astype(jnp.int32)
                dets5 = jnp.concatenate(
                    [cat_boxes[top_idx], top_scores[:, None]], axis=1)
                if vote_method == "BBOX_VOTE":
                    out, cnt = nms_jax.bbox_vote_device(
                        dets5, n_above, nms_thresh)
                else:                         # plain NMS
                    keep_idx, _, n_keep = nms_jax.nms_device(
                        dets5[:, :4], top_scores, nms_thresh,
                        n_valid=n_above)
                    out = dets5[keep_idx]
                    cnt = n_keep.astype(jnp.int32)
                return out, cnt
            if merged_cap <= 0:
                # no truncation (reference semantics): O(N) scatter
                # compaction instead of a sort — the host vote re-sorts,
                # so order is irrelevant, only the surviving SET matters
                pos = jnp.where(keep, jnp.cumsum(keep) - 1, total)
                rows = jnp.concatenate(
                    [cat_boxes, cat_scores[:, None]], axis=1)
                packed = jnp.zeros((total, 5), rows.dtype)
                packed = packed.at[pos].set(rows, mode="drop")
                n = keep.sum()
            else:
                sortable = jnp.where(keep, cat_scores, -jnp.inf)
                k = min(merged_cap, total)
                top_scores, top_idx = lax.top_k(sortable, k)
                packed = jnp.concatenate(
                    [cat_boxes[top_idx], top_scores[:, None]], axis=1)
                n = jnp.minimum(keep.sum(), k)
            return packed, n.astype(jnp.int32)

        return run

    def _pyramid_program(self, key):
        """One fused program running EVERY pyramid level (+flip batch) from
        the single uploaded raw image — one dispatch and one readback per
        image instead of one per level. key = (H0b, W0b,
        ((hb, wb), ...per level), flip, vote_method|None, mask_mode)."""
        if key in self._compiled_dev:
            self._compiled_dev.move_to_end(key)
            return self._compiled_dev[key]
        if len(self._compiled_dev) >= self._max_programs:
            self._compiled_dev.popitem(last=False)
        H0b, W0b, level_buckets, flip, vote_method = key[:5]
        run = self._build_run(level_buckets, flip, vote_method)

        if self.spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from smallhardface_tpu.parallel.mesh import SPATIAL_AXIS
            mesh = self.spatial_mesh
            fn = jax.jit(
                run,
                in_shardings=(
                    NamedSharding(mesh, P()),                 # params
                    NamedSharding(mesh, P()),                 # qstate
                    NamedSharding(mesh, P(SPATIAL_AXIS)),     # raw image H
                ) + (NamedSharding(mesh, P()),) * 8,
                out_shardings=NamedSharding(mesh, P()))
        else:
            fn = jax.jit(run)
        self._compiled_dev[key] = fn
        return fn

    def _program(self, shape):
        """Jitted forward+decode for a (B, H, W) padded shape (host-preproc
        path). Keyed by (shape, mask_mode, s2d): the program bakes the
        masking strategy and stem form in, and band_margin is only safe
        with margin buckets."""
        shape = shape + (_mask_plan()[0], bool(cfg.TPU.S2D_STEM),
                         bool(cfg.TPU.PALLAS_STEM),
                         self.qstate is not None,
                         int(cfg.TPU.DECODE_FAST_K))
        if shape in self._compiled:
            self._compiled.move_to_end(shape)
            return self._compiled[shape]
        if len(self._compiled) >= self._max_programs:
            self._compiled.popitem(last=False)
        spec = self.spec
        cd = self.compute_dtype

        def run(params, qstate, x, im_h, im_w, valid_h, valid_w, min_size,
                score_thresh):
            out = detector_mod.forward(
                params, x, spec, compute_dtype=cd,
                valid_hw=(valid_h * detector_mod.FEAT_STRIDE,
                          valid_w * detector_mod.FEAT_STRIDE),
                mask_mode=_mask_plan()[0],
                s2d_stem=bool(cfg.TPU.S2D_STEM),
                # host-preproc only (spatial_mesh + HOST_PREPROC is
                # rejected at construction, so no mesh plumbing here)
                pallas_stem=bool(cfg.TPU.PALLAS_STEM),
                qstate=qstate)
            return self._decode_batch(out, im_h, im_w, valid_h, valid_w,
                                      min_size, score_thresh,
                                      fast_k=int(cfg.TPU.DECODE_FAST_K))

        fn = jax.jit(run)
        self._compiled[shape] = fn
        return fn

    def forward_scale(self, ims, im_h, im_w, score_thresh=None):
        """Host-preproc path: run one pyramid level from already-resized,
        mean-subtracted host images. ims: list of HWC float32 images of
        identical (im_h, im_w) (e.g. [image, flipped image]). Returns
        (boxes (B, cap, 4), scores (B, cap), counts (B,)) numpy."""
        b = len(ims)
        h16 = _round_up(im_h, cfg.MAX_RESOLUTION)
        w16 = _round_up(im_w, cfg.MAX_RESOLUTION)
        mask_mode, margin = _mask_plan()
        # "exact" compiles per ×16 shape (TEST_BUCKET ignored): the
        # bucket IS the valid extent and the forward runs unmasked
        bucket = (cfg.MAX_RESOLUTION if mask_mode == "exact"
                  else max(int(cfg.TPU.TEST_BUCKET), cfg.MAX_RESOLUTION))
        hb = _round_up(h16 + margin, bucket)
        wb = _round_up(w16 + margin, bucket)
        x = np.zeros((b, hb, wb, 3), dtype=np.float32)
        for i, im in enumerate(ims):
            x[i, :im_h, :im_w] = im
        fn = self._program((b, hb, wb))
        xd = jnp.asarray(x)
        if self.device is not None:
            xd = jax.device_put(xd, self.device)
        boxes, scores, counts = fn(
            self.params, self.qstate, xd,
            jnp.float32(im_h), jnp.float32(im_w),
            jnp.int32(h16 // detector_mod.FEAT_STRIDE),
            jnp.int32(w16 // detector_mod.FEAT_STRIDE),
            jnp.float32(0.0),
            jnp.float32(score_thresh if score_thresh is not None
                        else cfg.TEST.SCORE_THRESH))
        return (np.asarray(boxes), np.asarray(scores),
                np.asarray(counts))

    def calibrate_int8(self, images):
        """Calibrate static int8 activation scales (TPU.PRECISION='int8').

        images: iterable of BGR uint8 arrays or paths. Each is resized to
        every TEST scale (host cv2 — the convention the device resize
        mimics), mean-subtracted, padded to ×16, and run through an fp32
        amax-collection forward; the per-layer maxima + prebaked int8
        weights become self.qstate (models/detector.make_qstate), which
        replaces the dynamic per-tensor max-reduces with fused
        elementwise quantizes. Compiled program caches are cleared (the
        programs bake the qstate structure in). Returns the amax dict.

        One-time cost per calibration set; values outside the calibrated
        ranges saturate (symmetric clip) — use representative images.
        """
        if self.compute_dtype != "int8":
            raise ValueError(
                "calibrate_int8 requires TPU.PRECISION='int8'")
        mean = jnp.asarray(cfg.PIXEL_MEANS, jnp.float32).reshape(1, 1, 3)
        # uint8 uploads only (H2D ≈ 30 MB/s through the tunnel — a 5-level
        # float32 pyramid would add minutes per eval worker): resize in
        # uint8 on host, cast + mean-subtract + zero-pad on device. The
        # sub-LSB rounding vs a float resize is immaterial to range
        # calibration.
        prep = jax.jit(
            lambda u, hb, wb: jnp.pad(
                (u.astype(jnp.float32) - mean)[None],
                ((0, 0), (0, hb - u.shape[0]), (0, wb - u.shape[1]),
                 (0, 0))),
            static_argnums=(1, 2))
        xs = []
        for im in images:
            if isinstance(im, str):
                im = cv2.imread(im)
            for scale in _pyramid_scales(im.shape):
                r8 = cv2.resize(im, None, fx=scale, fy=scale,
                                interpolation=cv2.INTER_LINEAR)
                h, w = r8.shape[:2]
                hb = _round_up(h, cfg.MAX_RESOLUTION)
                wb = _round_up(w, cfg.MAX_RESOLUTION)
                xs.append(prep(jnp.asarray(r8), hb, wb))
        amax = detector_mod.collect_int8_amax(self.params, self.spec, xs)
        self.qstate = detector_mod.make_qstate(self.params, self.spec,
                                               amax)
        self._compiled.clear()
        self._compiled_dev.clear()
        logger.info("int8 calibration over %d pyramid inputs: %s",
                    len(xs),
                    {k: round(v, 1) for k, v in sorted(amax.items())})
        return amax

    def _prep(self, im):
        """Pad the raw image and compute the per-level scale metadata and
        program cache key — shared by detect_async and detect_many."""
        if isinstance(im, str):
            im = cv2.imread(im)
        h0, w0 = im.shape[:2]
        pyramid_scales = _pyramid_scales(im.shape)
        mask_mode, margin = _mask_plan()
        # "exact" compiles one program per distinct ×16 pyramid geometry
        # (TEST_BUCKET ignored): buckets == valid extents, the forward
        # runs unmasked, and the LRU bounds the program count — intended
        # for fixed-resolution (serving) workloads where shapes repeat
        bucket = (cfg.MAX_RESOLUTION if mask_mode == "exact"
                  else max(int(cfg.TPU.TEST_BUCKET), cfg.MAX_RESOLUTION))
        H0b = _round_up(h0, bucket)
        W0b = _round_up(w0, bucket)
        padded = np.pad(im, ((0, H0b - h0), (0, W0b - w0), (0, 0)),
                        mode="edge")
        hs_l, ws_l, vh_l, vw_l, buckets = [], [], [], [], []
        for scale in pyramid_scales:
            h_s = int(round(h0 * scale))
            w_s = int(round(w0 * scale))
            hs_l.append(h_s)
            ws_l.append(w_s)
            v_h = _round_up(max(h_s, 1), cfg.MAX_RESOLUTION)
            v_w = _round_up(max(w_s, 1), cfg.MAX_RESOLUTION)
            vh_l.append(v_h // detector_mod.FEAT_STRIDE)
            vw_l.append(v_w // detector_mod.FEAT_STRIDE)
            # +margin: the band_margin fast path needs bucket ≥ valid+32
            buckets.append((
                _round_up(max(v_h + margin, cfg.MAX_RESOLUTION), bucket),
                _round_up(max(v_w + margin, cfg.MAX_RESOLUTION), bucket)))
        vote_method = str(cfg.TEST.NMS_METHOD) if self.device_vote else None
        key = (H0b, W0b, tuple(buckets), bool(cfg.TEST.FLIP),
               vote_method, mask_mode, bool(cfg.TPU.S2D_STEM),
               bool(cfg.TPU.PALLAS_STEM), self.qstate is not None,
               bool(cfg.TPU.LEVEL_SERIAL), int(cfg.TPU.FLIP_SPLIT_PX),
               int(cfg.TPU.DECODE_FAST_K))
        return {
            "padded": padded,
            "key": key,
            "inv_fx": np.asarray([1.0 / s for s in pyramid_scales],
                                 np.float32),
            "h_s": np.asarray(hs_l, np.int32),
            "w_s": np.asarray(ws_l, np.int32),
            "vh": np.asarray(vh_l, np.int32),
            "vw": np.asarray(vw_l, np.int32),
        }

    def detect_async(self, im, thresh=0.05, score_thresh=None):
        """Upload + dispatch the fused pyramid program for one image.
        `thresh` is the detect-level cut (probs > thresh,
        lib/test.py:163) applied on device before the merged top-k.
        Returns an opaque handle for finalize_async (results stay on
        device until then, so dispatch overlaps host work)."""
        p = self._prep(im)
        if self.spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from smallhardface_tpu.parallel.mesh import SPATIAL_AXIS
            # device_put on the numpy array transfers each H-shard exactly
            # once (jnp.asarray first would upload to device 0, then
            # rescatter device-to-device)
            raw = jax.device_put(
                p["padded"],
                NamedSharding(self.spatial_mesh, P(SPATIAL_AXIS)))
        else:
            raw = jnp.asarray(p["padded"])
            if self.device is not None:
                raw = jax.device_put(raw, self.device)

        fn = self._pyramid_program(p["key"])
        packed, n = fn(
            self.params, self.qstate, raw,
            jnp.asarray(p["inv_fx"]),
            jnp.asarray(p["h_s"]), jnp.asarray(p["w_s"]),
            jnp.asarray(p["vh"]), jnp.asarray(p["vw"]),
            jnp.float32(score_thresh if score_thresh is not None
                        else cfg.TEST.SCORE_THRESH),
            jnp.float32(thresh),
            jnp.float32(cfg.TEST.NMS_THRESH))
        return {"packed": packed, "n": n, "voted": self.device_vote}

    def _pyramid_program_batched(self, key, batch):
        """jit∘vmap of the fused pyramid function over a leading image
        batch axis (params and thresholds broadcast). Cached per
        (key, batch)."""
        bkey = key + ("batch", batch)
        if bkey in self._compiled_dev:
            self._compiled_dev.move_to_end(bkey)
            return self._compiled_dev[bkey]
        if len(self._compiled_dev) >= self._max_programs:
            self._compiled_dev.popitem(last=False)
        level_buckets, flip, vote_method = key[2], key[3], key[4]
        # fast_decode off: vmap turns the fast-k cond into a select that
        # executes BOTH branches — the full top_k would run anyway
        run = self._build_run(level_buckets, flip, vote_method,
                              fast_decode=False)
        fn = jax.jit(jax.vmap(
            run, in_axes=(None, None, 0, 0, 0, 0, 0, 0, None, None, None)))
        self._compiled_dev[bkey] = fn
        return fn

    def detect_many(self, ims, thresh=0.05, score_thresh=None,
                    max_batch=None):
        """Batched multi-image detection: images sharing a pyramid bucket
        run as ONE device program over a batch axis — the whole point of a
        large-batch accelerator; the reference could only shard images
        across GPUs one at a time (lib/test.py:319-344).

        Detections are numerically equivalent to per-image detect() — vmap
        adds a batch dimension to the same ops (XLA's batched recompile can
        shift the last float ulps). Images of different padded shapes fall
        into separate groups (each its own compiled program); callers
        wanting a bounded program count should bucket inputs by size.
        max_batch bounds the images per dispatch: a full 5-level ×flip
        pyramid peaks ~1.2 GiB HBM per image (measured compile-time
        analysis at WIDER shapes, scripts/hbm_probe.py — B=4 = 4.9 GiB),
        so B=4 fits a 16 GB v5e with room; the bound mainly caps compile
        time and per-dispatch upload burst. Returns a list of cls_dets
        in input order.

        Under cfg.TPU.HOST_PREPROC (the reference-exact parity path) there
        is no batched device program; rather than silently running a
        different numeric path than asked, fall back to per-image
        detect() with a one-time warning."""
        if self.host_preproc:
            if score_thresh is not None:
                raise ValueError(
                    "detect_many(score_thresh=...) is not supported under "
                    "TPU.HOST_PREPROC (the host path applies "
                    "cfg.TEST.SCORE_THRESH)")
            if not getattr(self, "_warned_host_preproc", False):
                logger.warning(
                    "TPU.HOST_PREPROC is set: detect_many falls back to "
                    "sequential per-image detect() (no batched device "
                    "program on the host-preproc parity path)")
                self._warned_host_preproc = True
            return [self.detect(im, thresh)[0] for im in ims]
        assert self.spatial_mesh is None, (
            "detect_many batches per chip; use one detector per chip for "
            "spatial sharding")
        preps = [self._prep(im) for im in ims]
        from collections import defaultdict
        groups = defaultdict(list)
        for i, p in enumerate(preps):
            groups[p["key"]].append(i)
        st = jnp.float32(score_thresh if score_thresh is not None
                         else cfg.TEST.SCORE_THRESH)
        results = [None] * len(preps)
        if max_batch and max_batch > 0:
            chunked = {}
            for key, idxs in groups.items():
                for c in range(0, len(idxs), max_batch):
                    chunked[key + ("chunk", c)] = (key,
                                                   idxs[c:c + max_batch])
            groups = {k: v[1] for k, v in chunked.items()}
            keys_of = {k: v[0] for k, v in chunked.items()}
        else:
            keys_of = {k: k for k in groups}
        for gkey, idxs in groups.items():
            key = keys_of[gkey]
            fn = self._pyramid_program_batched(key, len(idxs))
            stack = lambda name: jnp.asarray(
                np.stack([preps[i][name] for i in idxs]))
            raw = stack("padded")
            if self.device is not None:
                raw = jax.device_put(raw, self.device)
            packed, n = fn(
                self.params, self.qstate, raw, stack("inv_fx"),
                stack("h_s"), stack("w_s"), stack("vh"), stack("vw"),
                st, jnp.float32(thresh), jnp.float32(cfg.TEST.NMS_THRESH))
            ns = np.asarray(n)
            for bi, i in enumerate(idxs):
                handle = {"packed": packed[bi], "n": int(ns[bi]),
                          "voted": self.device_vote}
                results[i] = self.finalize_async(handle, thresh)
        return results

    def finalize_async(self, handle, thresh=0.05):
        """Read back one image's device results. Returns cls_dets like
        detect(). (`thresh` was already applied on device at dispatch.)
        Only the first `n` rows transfer to the host — the device slice
        keeps crowded-image readbacks proportional to the detection count.

        With device voting (TPU.DEVICE_VOTE) the rows ARE the final
        detections; host work reduces to the empty-input dummy fallback.
        Otherwise the reference's float64 host NMS/vote runs here."""
        n = int(np.asarray(handle["n"]))
        total = handle["packed"].shape[0]
        # slice size rounded to 1024 so the on-device slice op compiles a
        # bounded number of times while transfers stay ∝ detection count
        k = min(_round_up(max(n, 1), 1024), total)
        dets = np.asarray(handle["packed"][:k])[:n].astype(np.float32)
        if handle.get("voted"):
            if cfg.TEST.NMS_METHOD == "BBOX_VOTE" and n == 0:
                # reference dummy detection for empty input
                # (lib/test.py:183-185)
                dets = np.array([[10, 10, 20, 20, 0.0001]], np.float32)
            return [dets]
        if cfg.TEST.NMS_METHOD == "BBOX_VOTE":
            return [nms_host.bbox_vote(dets, cfg.TEST.NMS_THRESH)]
        elif cfg.TEST.NMS_METHOD == "NMS":
            keep = nms_host.nms(dets, cfg.TEST.NMS_THRESH)
            return [dets[keep, :]]
        raise NotImplementedError(
            f"Unknown NMS method: {cfg.TEST.NMS_METHOD}")

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

        if not self.host_preproc:
            # fused whole-pyramid device path: one dispatch + one readback
            timers["detect"].tic()
            handle = self.detect_async(im, thresh)
            timers["detect"].toc()
            timers["misc"].tic()
            cls_dets = self.finalize_async(handle, thresh)
            timers["misc"].toc()
            return cls_dets, timers

        timers["detect"].tic()
        pyramid_scales = _pyramid_scales(im.shape)

        all_boxes = []
        all_scores = []

        def collect(boxes, scores, counts, w, scale):
            for i in range(boxes.shape[0]):
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

        im_f = im.astype(np.float32) - np.asarray(
            cfg.PIXEL_MEANS, dtype=np.float32)
        for scale in pyramid_scales:
            if scale == 1.0:
                resized = im_f
            else:
                resized = cv2.resize(im_f, None, None, fx=scale,
                                     fy=scale,
                                     interpolation=cv2.INTER_LINEAR)
            h, w = resized.shape[:2]
            ims = [resized]
            if cfg.TEST.FLIP:
                ims.append(resized[:, ::-1])
            boxes, scores, counts = self.forward_scale(ims, h, w)
            collect(boxes, scores, counts, w, scale)

        probs = np.concatenate(all_scores)
        boxes = np.concatenate(all_boxes)
        timers["detect"].toc()

        timers["misc"].tic()
        inds = np.where(probs > thresh)[0]
        dets = np.hstack(
            (boxes[inds], probs[inds, None])).astype(np.float32)
        if cfg.TEST.NMS_METHOD == "BBOX_VOTE":
            cls_dets = [nms_host.bbox_vote(dets, cfg.TEST.NMS_THRESH)]
        elif cfg.TEST.NMS_METHOD == "NMS":
            keep = nms_host.nms(dets, cfg.TEST.NMS_THRESH)
            cls_dets = [dets[keep, :]]
        else:
            raise NotImplementedError(
                f"Unknown NMS method: {cfg.TEST.NMS_METHOD}")
        timers["misc"].toc()
        return cls_dets, timers
