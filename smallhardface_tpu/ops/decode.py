"""On-device proposal decode: anchors + deltas → clipped, thresholded,
top-k'd detections with static shapes.

Replaces the host-side ProposalLayer
(/root/reference/lib/layers/proposal_layer.py:60-220): decode over the dense
(h, w, A) anchor grid, clip to the image, min-size filter, score threshold
with keep-at-least-one, and a fixed-capacity top-k (TEST.N_DETS_PER_MODULE).
Everything stays on device; no per-image host round-trip remains.

Semantics notes (for parity):
  - grid covers the ×16-padded image as in the reference; positions beyond
    `valid_h/valid_w` (extra bucket padding for shape reuse) are masked out
    because the reference never saw them.
  - when nothing clears the score threshold the single best anchor is kept
    (proposal_layer.py:183-185).
  - at TEST min_size is 0 ⇒ the filter is a no-op; kept general for the
    TRAIN-phase configuration (ANCHOR_MIN_SIZE × im_scale).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from smallhardface_tpu.ops import bbox_jax


def dense_anchor_grid(h, w, base_anchors, feat_stride):
    """(h, w, A, 4) anchor grid as a jnp constant inside jit."""
    a = jnp.asarray(base_anchors, jnp.float32)           # (A, 4)
    ys = (jnp.arange(h, dtype=jnp.float32) * feat_stride)[:, None, None]
    xs = (jnp.arange(w, dtype=jnp.float32) * feat_stride)[None, :, None]
    shift = jnp.stack([
        jnp.broadcast_to(xs, (h, w, a.shape[0])),
        jnp.broadcast_to(ys, (h, w, a.shape[0])),
        jnp.broadcast_to(xs, (h, w, a.shape[0])),
        jnp.broadcast_to(ys, (h, w, a.shape[0])),
    ], axis=-1)
    return a[None, None, :, :] + shift


def decode_proposals(fg_scores, bbox_deltas, base_anchors, *,
                     feat_stride, im_h, im_w, valid_h, valid_w,
                     score_thresh, min_size, capacity,
                     refine_deltas=None, anchor_strides=None):
    """Decode one image's proposals.

    fg_scores: (h, w, A) foreground probabilities
    bbox_deltas: (h, w, A, 4)
    im_h/im_w: float scalars — unpadded image extent for clipping
    valid_h/valid_w: int scalars — valid grid extent (ceil16(im)/stride)
    min_size: float scalar (already scaled by im_scale)
    refine_deltas: optional list of (h, w, A, 4) cascade refinement deltas,
      applied in order after the base decode with the reference's x2/y2
      compensation (proposal_layer.py:147-155)
    anchor_strides: optional (A,) ints — per-anchor sub-grid striding for
      multi-stride anchor sets (proposal_layer.py:160-169); anchors of
      stride s live only at grid positions divisible by s
    Returns (boxes (capacity, 4), scores (capacity,), n_keep scalar int32).
    """
    boxes, sortable, n_keep, capacity = _decode_fields(
        fg_scores, bbox_deltas, base_anchors, feat_stride=feat_stride,
        im_h=im_h, im_w=im_w, valid_h=valid_h, valid_w=valid_w,
        score_thresh=score_thresh, min_size=min_size, capacity=capacity,
        refine_deltas=refine_deltas, anchor_strides=anchor_strides)
    top_scores, top_idx = lax.top_k(sortable, capacity)
    top_boxes = boxes[top_idx]
    return top_boxes, top_scores, n_keep


def _decode_fields(fg_scores, bbox_deltas, base_anchors, *,
                   feat_stride, im_h, im_w, valid_h, valid_w,
                   score_thresh, min_size, capacity,
                   refine_deltas=None, anchor_strides=None):
    """Elementwise half of decode_proposals: decoded+clipped boxes
    (flattened (hwA, 4)), the keepability-masked score vector, and the
    clamped keep count — everything before the top-k selection."""
    h, w, A = fg_scores.shape
    anchors = dense_anchor_grid(h, w, np.asarray(base_anchors), feat_stride)
    boxes = bbox_jax.bbox_transform_inv(anchors, bbox_deltas)
    if refine_deltas is not None:
        for rd in refine_deltas:
            # compensate the +1 width/height the encode/decode asymmetry
            # introduces between cascade stages (proposal_layer.py:147-151)
            boxes = boxes.at[..., 2:4].add(-1.0)
            boxes = bbox_jax.bbox_transform_inv(boxes, rd)
    boxes = bbox_jax.clip_boxes(boxes, im_h, im_w)

    gy = lax.broadcasted_iota(jnp.int32, (h, w, A), 0)
    gx = lax.broadcasted_iota(jnp.int32, (h, w, A), 1)
    grid_ok = (gy < valid_h) & (gx < valid_w)
    if anchor_strides is not None:
        strides = jnp.asarray(np.asarray(anchor_strides, np.int32))
        sub_ok = ((gy % strides[None, None, :]) == 0) & \
                 ((gx % strides[None, None, :]) == 0)
        grid_ok = grid_ok & sub_ok

    ws = boxes[..., 2] - boxes[..., 0] + 1
    hs = boxes[..., 3] - boxes[..., 1] + 1
    size_ok = (ws >= min_size) & (hs >= min_size)

    capacity = min(int(capacity), h * w * A)
    keepable = grid_ok & size_ok
    sortable = jnp.where(keepable, fg_scores, -jnp.inf).reshape(-1)
    n_above = jnp.sum(sortable >= score_thresh).astype(jnp.int32)
    n_keep = jnp.clip(n_above, 1, capacity)
    return boxes.reshape(-1, 4), sortable, n_keep, capacity


def decode_proposals_batch(fg_scores, bbox_deltas, base_anchors, *,
                           feat_stride, im_h, im_w, valid_h, valid_w,
                           score_thresh, min_size, capacity, fast_k=0):
    """Batched decode_proposals (leading batch axis on fg_scores/deltas)
    with an optional threshold-aware fast top-k.

    fast_k <= 0 (or >= effective capacity): exactly
    vmap(decode_proposals) — one lax.top_k(capacity) per batch item.

    fast_k > 0: rows beyond n_keep are masked/sliced away by every
    caller (detect.py row_ok mask; forward_scale's [:count] host slice),
    and top_k(x, k1)[i] == top_k(x, k2)[i] for i < k1 <= k2 (same sort,
    same index tie-break) — so when EVERY batch item's above-threshold
    count fits in fast_k, a top_k(fast_k) padded out to capacity is
    bitwise-identical on all live rows at a fraction of the sort cost
    (the per-level top-k chains were ~half the fused pyramid's
    decode+merge stage, PERF_NOTES r5). A lax.cond keeps the full
    top_k(capacity) path for the rare overflow (crowded images / random
    weights), preserving the N_DETS_PER_MODULE cap semantics exactly.
    NB: keep the cond out of vmap (it becomes a select that pays BOTH
    branches) — detect.py's batched program passes fast_k=0.
    """
    _, h, w, A = fg_scores.shape
    cap = min(int(capacity), h * w * A)

    def prep(p, d):
        bx, s, n, _ = _decode_fields(
            p, d, base_anchors, feat_stride=feat_stride,
            im_h=im_h, im_w=im_w, valid_h=valid_h, valid_w=valid_w,
            score_thresh=score_thresh, min_size=min_size,
            capacity=capacity)
        return bx, s, n

    boxes_b, sortable_b, n_keep_b = jax.vmap(prep)(fg_scores, bbox_deltas)

    def full_sel(args):
        sortable, boxes = args

        def one(s, bx):
            ts, ti = lax.top_k(s, cap)
            return bx[ti], ts

        return jax.vmap(one)(sortable, boxes)

    if fast_k <= 0 or fast_k >= cap:
        top_boxes, top_scores = full_sel((sortable_b, boxes_b))
        return top_boxes, top_scores, n_keep_b

    def fast_sel(args):
        sortable, boxes = args

        def one(s, bx):
            ts, ti = lax.top_k(s, fast_k)
            pad_s = jnp.full((cap - fast_k,), -jnp.inf, ts.dtype)
            pad_b = jnp.zeros((cap - fast_k, 4), bx.dtype)
            return (jnp.concatenate([bx[ti], pad_b], axis=0),
                    jnp.concatenate([ts, pad_s], axis=0))

        return jax.vmap(one)(sortable, boxes)

    # n_keep counts >= score_thresh entries (clamped to >= 1): every live
    # row fits in fast_k iff all n_keep <= fast_k
    fits = jnp.all(n_keep_b <= fast_k)
    top_boxes, top_scores = lax.cond(fits, fast_sel, full_sel,
                                     (sortable_b, boxes_b))
    return top_boxes, top_scores, n_keep_b


def decode_proposals_train(fg_scores, bbox_deltas, base_anchors, *,
                           feat_stride, im_h, im_w, valid_h, valid_w,
                           min_size, pre_nms_top, post_nms_top, nms_thresh):
    """TRAIN-phase ProposalLayer semantics
    (/root/reference/lib/layers/proposal_layer.py:171-202 under phase==0,
    keys TRAIN.ANCHOR_MIN_SIZE / ANCHOR_N_PRE_NMS / ANCHOR_N_POST_NMS /
    NMS_THRESH; min_size arrives pre-multiplied by im_scale,
    proposal_layer.py:174).

    Faithful-port note: the reference TRAIN branch never assigns
    `score_thresh` (only the TEST branch does, proposal_layer.py:86-92),
    so `max_score[order] >= score_thresh` raises NameError and the bare
    `except: thresh_idx = 0` (proposal_layer.py:180-184) silently keeps
    ONLY the top-scoring proposal; the subsequent NMS and post-NMS cap
    are then no-ops on a single box. The effective contract — reproduced
    here and proven against a full numpy port of the branch in
    tests/test_decode.py — is: top-score select (last maximal index
    under ties; the reference's unstable argsort leaves tie order
    unspecified) over (inside-grid ∧ min-size-ok) anchors, dummy roi
    (0, 0, 16, 16) when none qualifies
    (proposal_layer.py:206-207). pre_nms_top/post_nms_top/nms_thresh are
    accepted for call-signature parity with the config keys; they cannot
    change the result while the upstream quirk defines the contract.

    Returns (rois (1, 5) [batch0, x1, y1, x2, y2], scores (1,), n) with
    n = 1 when a proposal qualified else 0 (the dummy row).
    """
    del pre_nms_top, post_nms_top, nms_thresh   # see docstring
    h, w, A = fg_scores.shape
    anchors = dense_anchor_grid(h, w, np.asarray(base_anchors), feat_stride)
    boxes = bbox_jax.bbox_transform_inv(anchors, bbox_deltas)
    boxes = bbox_jax.clip_boxes(boxes, im_h, im_w)

    gy = lax.broadcasted_iota(jnp.int32, (h, w, A), 0)
    gx = lax.broadcasted_iota(jnp.int32, (h, w, A), 1)
    grid_ok = (gy < valid_h) & (gx < valid_w)
    ws = boxes[..., 2] - boxes[..., 0] + 1
    hs = boxes[..., 3] - boxes[..., 1] + 1
    keepable = grid_ok & (ws >= min_size) & (hs >= min_size)

    sortable = jnp.where(keepable, fg_scores, -jnp.inf).reshape(-1)
    # tie-break: the reference's argsort()[::-1] uses numpy's UNSTABLE
    # default sort, so its tie order is unspecified; we pin the defined
    # convention a stable ascending argsort reversed would give — the
    # LAST maximal index (ties are realistic: trained softmax saturates
    # many anchors to exactly 1.0 on confident faces). jnp.argmax picks
    # the first, so argmax the reversed array instead.
    n_flat = sortable.shape[0]
    best = n_flat - 1 - jnp.argmax(sortable[::-1])
    any_ok = jnp.any(keepable)
    top_box = boxes.reshape(-1, 4)[best]
    dummy = jnp.asarray([0.0, 0.0, 16.0, 16.0], jnp.float32)
    roi_box = jnp.where(any_ok, top_box, dummy)
    rois = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                            roi_box]).reshape(1, 5)
    score = jnp.where(any_ok, sortable[best], 0.0).reshape(1)
    return rois, score, any_ok.astype(jnp.int32)
