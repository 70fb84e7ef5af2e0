"""Anchor targets + anchor-level OHEM + easy-image detection, inside jit.

Re-implementation of the reference's MultiLayerAnchorLayer
(/root/reference/lib/layers/multi_layer_anchor_layer.py:88-338) as a pure
function of the current forward scores — the reference ran this as a host
Python layer mid-forward; here it runs on device with static shapes:

  - dense anchors over the (possibly bucket-padded) stride-8 grid; positions
    beyond the ×16 grid of the actual image are permanently excluded
  - inside-image test with allowed_border=0 (fall back to the whole valid
    grid if nothing is inside, :143-145)
  - IoU vs padded gt boxes via a G-chunked scan (replaces Cython
    bbox_overlaps)
  - label: fg ≥ ANCHOR_POSITIVE_OVERLAP (0.5), bg < ANCHOR_NEGATIVE_OVERLAP
    (0.3), else ignore (-1)
  - OHEM (ohem=True in the shipped templates): keep the `num_fg` positives
    with LOWEST fg-confidence (hardest, :209-217), then the
    `anchors_per_batch - n_fg` negatives with LOWEST bg-probability
    (hardest, :240-247); fixed-k lax.top_k replaces argpartition
  - regression targets for ALL anchors with IoU ≥ ANCHOR_REGRESSION_OVERLAP
    (0.3), outside-weights uniform 1/num (:249-273)
  - easy-image flag: every positive's fg-confidence ≥ THRESHOLD on all
    levels (all([]) == True when there are no positives, :196-206)
  - per-level accuracy metric (:274-281)

All comparisons use the same thresholds and orderings; tie-breaking inside
top-k differs from numpy argpartition (both unspecified), which only matters
when two anchors have bit-identical scores.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from smallhardface_tpu.ops import bbox_jax
from smallhardface_tpu.ops.decode import dense_anchor_grid


@dataclasses.dataclass(frozen=True)
class TargetConfig:
    """Static target-assignment parameters (from cfg at trace time)."""
    positive_overlap: float = 0.5
    negative_overlap: float = 0.3
    regression_overlap: float = 0.3
    anchors_per_batch: int = 256
    fg_fraction: float = 0.25
    positive_mining: bool = True
    hard_mining: bool = True            # 'ohem': True in the templates
    allowed_border: float = 0.0
    easy_enable: bool = False
    easy_threshold: float = 1.0
    accuracy_threshold: float = 0.9
    bbox_inside_weight: float = 1.0


def from_cfg(cfg) -> TargetConfig:
    return TargetConfig(
        positive_overlap=float(cfg.TRAIN.ANCHOR_POSITIVE_OVERLAP),
        negative_overlap=float(cfg.TRAIN.ANCHOR_NEGATIVE_OVERLAP),
        regression_overlap=float(cfg.TRAIN.ANCHOR_REGRESSION_OVERLAP),
        anchors_per_batch=int(cfg.TRAIN.ANCHOR_SAMPLING.ANCHORS_PER_BATCH),
        fg_fraction=float(cfg.TRAIN.ANCHOR_SAMPLING.ANCHOR_FG_FRACTION),
        positive_mining=bool(cfg.TRAIN.POSITIVE_MINING),
        easy_enable=bool(cfg.TRAIN.DISABLE_EASY_IMAGE.ENABLE),
        easy_threshold=float(cfg.TRAIN.DISABLE_EASY_IMAGE.THRESHOLD),
        accuracy_threshold=float(cfg.MISC.ACCURACY_THRESHOLD),
        bbox_inside_weight=float(cfg.TRAIN.BBOX_INSIDE_WEIGHTS[0]),
    )


def _bottom_k_mask(scores, k_static, n_select, selectable):
    """Boolean mask choosing the `n_select` (dynamic, ≤ k_static) smallest
    `scores` among `selectable` entries."""
    masked = jnp.where(selectable, scores, jnp.inf)
    neg_vals, idx = lax.top_k(-masked, k_static)     # k smallest, ascending
    rank_ok = (jnp.arange(k_static) < n_select) & jnp.isfinite(neg_vals)
    mask = jnp.zeros(scores.shape[0], dtype=bool)
    return mask.at[idx].set(rank_ok)


def anchor_targets(bg_prob, base_anchors, gt_boxes, gt_mask, *,
                   im_h, im_w, valid_h, valid_w, tc: TargetConfig,
                   feat_stride=8, axis_name=None):
    """Compute per-anchor training targets for one image.

    bg_prob: (h, w, A) background probability from the CURRENT forward
             (already softmaxed; caller applies stop_gradient)
    gt_boxes: (G, 5) padded [x1, y1, x2, y2, cls]; gt_mask: (G,) bool
    im_h/im_w: float scalars (actual image extent, im_info)
    valid_h/valid_w: int scalars (×16-grid extent / stride)

    Returns dict of flat (N,) / (N, 4) arrays over the (h, w, a) anchor
    order: labels (-1/0/cls), bbox_targets, inside/outside weights, plus
    scalars: easy (bool), accuracy, n_fg, n_bg.
    """
    h, w, A = bg_prob.shape
    anchors = dense_anchor_grid(h, w, np.asarray(base_anchors),
                                feat_stride).reshape(-1, 4)
    n = anchors.shape[0]
    scores = bg_prob.reshape(-1)

    gy = lax.broadcasted_iota(jnp.int32, (h, w, A), 0).reshape(-1)
    gx = lax.broadcasted_iota(jnp.int32, (h, w, A), 1).reshape(-1)
    grid_ok = (gy < valid_h) & (gx < valid_w)

    border = tc.allowed_border
    inside = (
        (anchors[:, 0] >= -border) & (anchors[:, 1] >= -border) &
        (anchors[:, 2] < im_w + border) & (anchors[:, 3] < im_h + border))
    inside = inside & grid_ok
    # reference fallback: no anchors inside → use them all (:143-145)
    inside = jnp.where(inside.any(), inside, grid_ok)

    use_pallas = False
    if gt_boxes.shape[0] <= 512:
        try:
            import jax as _jax
            use_pallas = _jax.default_backend() == "tpu"
        except Exception:
            use_pallas = False
    if use_pallas:
        # VMEM/SMEM-resident kernel — no HBM IoU slabs (ops/pallas_iou.py)
        from smallhardface_tpu.ops.pallas_iou import pallas_max_iou
        max_iou, argmax_gt = pallas_max_iou(
            anchors.astype(jnp.float32), gt_boxes[:, :4], gt_mask,
            vma=(axis_name,) if axis_name else None)
    else:
        max_iou, argmax_gt = bbox_jax.max_iou_chunked(
            anchors, gt_boxes[:, :4], gt_mask, axis_name=axis_name)
    gt_cls = jnp.where(gt_mask, gt_boxes[:, 4], 0.0)

    labels = jnp.full((n,), -1.0)
    labels = jnp.where(inside & (max_iou < tc.negative_overlap), 0.0, labels)
    is_fg_cand = inside & (max_iou >= tc.positive_overlap)
    labels = jnp.where(is_fg_cand, gt_cls[argmax_gt], labels)

    fg_conf = 1.0 - scores            # confidence of non-background
    # easy-image: every positive candidate confident (vacuously true when
    # there are none, matching python all([]) — :196-206)
    easy = jnp.all(jnp.where(is_fg_cand, fg_conf >= tc.easy_threshold, True))

    # ---- positive OHEM ----
    num_fg_target = (int(tc.fg_fraction * tc.anchors_per_batch)
                     if tc.fg_fraction >= 0 else n)
    n_fg_cand = is_fg_cand.sum()
    num_fg_target = min(num_fg_target, n)
    if tc.positive_mining and tc.hard_mining and num_fg_target < n:
        keep_fg = _bottom_k_mask(fg_conf, num_fg_target,
                                 jnp.minimum(n_fg_cand, num_fg_target),
                                 is_fg_cand)
        # only subsample when over budget (:209-217)
        subsample = n_fg_cand > num_fg_target
        fg_final = jnp.where(subsample, keep_fg, is_fg_cand)
    else:
        fg_final = is_fg_cand
    labels = jnp.where(is_fg_cand & ~fg_final, -1.0, labels)

    # ---- negative OHEM ----
    n_fg = (labels > 0).sum()
    num_bg = tc.anchors_per_batch - n_fg          # fixed_num method
    is_bg = labels == 0
    n_bg_cand = is_bg.sum()
    if tc.hard_mining:
        keep_bg = _bottom_k_mask(scores, min(tc.anchors_per_batch, n),
                                 jnp.minimum(num_bg, n_bg_cand), is_bg)
        subsample = n_bg_cand > num_bg
        bg_final = jnp.where(subsample, keep_bg, is_bg)
    else:
        bg_final = is_bg
    labels = jnp.where(is_bg & ~bg_final, -1.0, labels)

    # ---- regression targets ----
    if tc.regression_overlap > 0:
        reg_mask = inside & (max_iou >= tc.regression_overlap)
    else:
        reg_mask = labels > 0
    matched_gt = gt_boxes[argmax_gt, :4]
    bbox_targets = bbox_jax.bbox_transform(anchors, matched_gt)
    bbox_targets = jnp.where(reg_mask[:, None], bbox_targets, 0.0)
    inside_w = jnp.broadcast_to(
        jnp.where(reg_mask[:, None], tc.bbox_inside_weight, 0.0), (n, 4))
    num_reg = reg_mask.sum()
    outside_w = jnp.broadcast_to(
        jnp.where(reg_mask[:, None],
                  jnp.where(num_reg > 0, 1.0 / jnp.maximum(num_reg, 1), 0.0),
                  0.0), (n, 4))

    # ---- accuracy metric (:274-281) ----
    thr = tc.accuracy_threshold
    correct = (jnp.where(labels > 0, scores < (1.0 - thr), False).sum() +
               jnp.where(labels == 0, scores >= thr, False).sum())
    n_sampled = (labels >= 0).sum()
    accuracy = jnp.where(n_sampled > 0, correct / jnp.maximum(n_sampled, 1),
                         1.0)

    return {
        "labels": labels,
        "bbox_targets": bbox_targets,
        "inside_weights": inside_w,
        "outside_weights": outside_w,
        "easy": easy,
        "accuracy": accuracy,
        "n_fg": n_fg,
        "n_bg": bg_final.sum(),
    }
