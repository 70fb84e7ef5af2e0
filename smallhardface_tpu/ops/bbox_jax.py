"""On-device (jnp) box geometry, numerically matching ops.bbox_np.

These run inside jitted programs: decode/clip in the test path
(replacing the host-side ProposalLayer numpy code,
/root/reference/lib/layers/proposal_layer.py:100-190) and encode/IoU in the
training target computation (replacing Cython bbox_overlaps,
/root/reference/lib/utils/bbox.pyx:16-70).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def bbox_transform_inv(boxes, deltas):
    """Decode deltas (..., 4) against boxes (..., 4); dw/dh > 50 clamp to 5
    (reference overflow recovery, bbox_transform.py:52-65)."""
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx, dy = deltas[..., 0], deltas[..., 1]
    dw = jnp.where(deltas[..., 2] > 50, 5.0, deltas[..., 2])
    dh = jnp.where(deltas[..., 3] > 50, 5.0, deltas[..., 3])

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([
        pred_ctr_x - 0.5 * pred_w,
        pred_ctr_y - 0.5 * pred_h,
        pred_ctr_x + 0.5 * pred_w,
        pred_ctr_y + 0.5 * pred_h,
    ], axis=-1)


def bbox_transform(ex_rois, gt_rois):
    """Encode gt (..., 4) w.r.t. example rois (..., 4) as (dx, dy, dw, dh)."""
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h
    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h
    return jnp.stack([
        (gt_cx - ex_cx) / ex_w,
        (gt_cy - ex_cy) / ex_h,
        jnp.log(gt_w / ex_w),
        jnp.log(gt_h / ex_h),
    ], axis=-1)


def clip_boxes(boxes, im_h, im_w):
    """Clip (..., 4) boxes into [0, W-1] × [0, H-1]."""
    x1 = jnp.clip(boxes[..., 0], 0, im_w - 1)
    y1 = jnp.clip(boxes[..., 1], 0, im_h - 1)
    x2 = jnp.clip(boxes[..., 2], 0, im_w - 1)
    y2 = jnp.clip(boxes[..., 3], 0, im_h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def iou_matrix(boxes, query):
    """IoU (N, K) with the +1 pixel convention (bbox.pyx:16-70)."""
    b_area = ((boxes[:, 2] - boxes[:, 0] + 1) *
              (boxes[:, 3] - boxes[:, 1] + 1))[:, None]
    q_area = ((query[:, 2] - query[:, 0] + 1) *
              (query[:, 3] - query[:, 1] + 1))[None, :]
    iw = (jnp.minimum(boxes[:, 2][:, None], query[None, :, 2]) -
          jnp.maximum(boxes[:, 0][:, None], query[None, :, 0]) + 1)
    ih = (jnp.minimum(boxes[:, 3][:, None], query[None, :, 3]) -
          jnp.maximum(boxes[:, 1][:, None], query[None, :, 1]) + 1)
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    union = b_area + q_area - inter
    return jnp.where(union > 0, inter / union, 0.0)


def max_iou_chunked(anchors, gt_boxes, gt_mask, chunk=128, axis_name=None):
    """Per-anchor (max IoU, argmax gt) against a padded gt array.

    anchors: (N, 4); gt_boxes: (G, 4) padded; gt_mask: (G,) bool.
    Computes in G-chunks with a scan so N×G never materializes fully —
    the HBM-friendly replacement for the dense Cython IoU matrix.
    Returns (max_iou (N,), argmax (N,) int32).
    """
    n = anchors.shape[0]
    g = gt_boxes.shape[0]
    pad_g = (-g) % chunk
    gt_b = jnp.pad(gt_boxes, ((0, pad_g), (0, 0)))
    gt_m = jnp.pad(gt_mask, (0, pad_g))
    num_chunks = (g + pad_g) // chunk
    gt_b = gt_b.reshape(num_chunks, chunk, 4)
    gt_m = gt_m.reshape(num_chunks, chunk)

    def body(carry, inp):
        best, best_idx, offset = carry
        cb, cm = inp
        iou = iou_matrix(anchors, cb)                  # (N, chunk)
        iou = jnp.where(cm[None, :], iou, -1.0)
        cmax = iou.max(axis=1)
        cargmax = iou.argmax(axis=1).astype(jnp.int32) + offset
        take = cmax > best
        return ((jnp.where(take, cmax, best),
                 jnp.where(take, cargmax, best_idx),
                 offset + chunk), None)

    init = (jnp.full((n,), -1.0, anchors.dtype),
            jnp.zeros((n,), jnp.int32),
            jnp.int32(0))
    # Under shard_map the scanned gt chunks are device-varying while the
    # constant init carry is replicated; align the carry's varying axes.
    if axis_name is not None:
        init = jax.tree_util.tree_map(
            lambda x: lax.pcast(x, axis_name, to="varying"), init)
    (best, best_idx, _), _ = lax.scan(body, init, (gt_b, gt_m))
    return jnp.maximum(best, 0.0), best_idx
