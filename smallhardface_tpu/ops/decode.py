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

    top_scores, top_idx = lax.top_k(sortable, capacity)
    top_boxes = boxes.reshape(-1, 4)[top_idx]
    return top_boxes, top_scores, n_keep
