"""Numpy box geometry — host-side oracles and eval-path implementations.

Covers the capabilities of the reference's Cython `bbox_overlaps`
(/root/reference/lib/utils/bbox.pyx:16-142) and the box encode/decode/clip
helpers (/root/reference/lib/utils/bbox_transform.py). Pixel conventions use
the +1 width/height of the Caffe-era detectors.
"""

from __future__ import annotations

import numpy as np


def bbox_overlaps(boxes, query_boxes):
    """IoU matrix (N, K) — vectorized equivalent of bbox.pyx:16-70."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    query_boxes = np.ascontiguousarray(query_boxes, dtype=np.float64)
    b_area = ((boxes[:, 2] - boxes[:, 0] + 1) *
              (boxes[:, 3] - boxes[:, 1] + 1))[:, None]
    q_area = ((query_boxes[:, 2] - query_boxes[:, 0] + 1) *
              (query_boxes[:, 3] - query_boxes[:, 1] + 1))[None, :]
    iw = (np.minimum(boxes[:, 2][:, None], query_boxes[:, 2][None, :]) -
          np.maximum(boxes[:, 0][:, None], query_boxes[:, 0][None, :]) + 1)
    ih = (np.minimum(boxes[:, 3][:, None], query_boxes[:, 3][None, :]) -
          np.maximum(boxes[:, 1][:, None], query_boxes[:, 1][None, :]) + 1)
    iw = np.maximum(iw, 0.0)
    ih = np.maximum(ih, 0.0)
    inter = iw * ih
    union = b_area + q_area - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def bbox_overlaps_ioa(boxes, query_boxes):
    """Intersection-over-area-of-box (N, K) — bbox.pyx:73-142."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    query_boxes = np.ascontiguousarray(query_boxes, dtype=np.float64)
    b_area = ((boxes[:, 2] - boxes[:, 0] + 1) *
              (boxes[:, 3] - boxes[:, 1] + 1))[:, None]
    iw = (np.minimum(boxes[:, 2][:, None], query_boxes[:, 2][None, :]) -
          np.maximum(boxes[:, 0][:, None], query_boxes[:, 0][None, :]) + 1)
    ih = (np.minimum(boxes[:, 3][:, None], query_boxes[:, 3][None, :]) -
          np.maximum(boxes[:, 1][:, None], query_boxes[:, 1][None, :]) + 1)
    iw = np.maximum(iw, 0.0)
    ih = np.maximum(ih, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        ioa = np.where(b_area > 0, iw * ih / b_area, 0.0)
    return ioa


def bbox_transform(ex_rois, gt_rois):
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. example rois
    (bbox_transform.py:12-30)."""
    ex_w = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
    ex_h = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
    ex_cx = ex_rois[:, 0] + 0.5 * ex_w
    ex_cy = ex_rois[:, 1] + 0.5 * ex_h
    gt_w = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
    gt_h = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
    gt_cx = gt_rois[:, 0] + 0.5 * gt_w
    gt_cy = gt_rois[:, 1] + 0.5 * gt_h
    return np.stack([
        (gt_cx - ex_cx) / ex_w,
        (gt_cy - ex_cy) / ex_h,
        np.log(gt_w / ex_w),
        np.log(gt_h / ex_h),
    ], axis=1)


def bbox_transform_inv(boxes, deltas):
    """Decode deltas into boxes; large dw/dh are clamped to avoid exp
    overflow, mirroring the reference's recovery path
    (bbox_transform.py:52-65 clamps >50 to 5)."""
    if boxes.shape[0] == 0:
        return np.zeros((0, deltas.shape[1]), dtype=deltas.dtype)
    boxes = boxes.astype(deltas.dtype, copy=False)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights

    dx = deltas[:, 0::4]
    dy = deltas[:, 1::4]
    dw = np.where(deltas[:, 2::4] > 50, 5.0, deltas[:, 2::4])
    dh = np.where(deltas[:, 3::4] > 50, 5.0, deltas[:, 3::4])

    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = np.exp(dw) * widths[:, None]
    pred_h = np.exp(dh) * heights[:, None]

    pred = np.zeros(deltas.shape, dtype=deltas.dtype)
    pred[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    pred[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    pred[:, 2::4] = pred_ctr_x + 0.5 * pred_w
    pred[:, 3::4] = pred_ctr_y + 0.5 * pred_h
    return pred


def clip_boxes(boxes, im_shape):
    """Clip boxes into [0, W-1] × [0, H-1] (bbox_transform.py:80-93)."""
    boxes = boxes.copy()
    boxes[:, 0::4] = np.clip(boxes[:, 0::4], 0, im_shape[1] - 1)
    boxes[:, 1::4] = np.clip(boxes[:, 1::4], 0, im_shape[0] - 1)
    boxes[:, 2::4] = np.clip(boxes[:, 2::4], 0, im_shape[1] - 1)
    boxes[:, 3::4] = np.clip(boxes[:, 3::4], 0, im_shape[0] - 1)
    return boxes
