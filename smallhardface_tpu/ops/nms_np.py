"""Host-side NMS and box voting — numpy oracles for the device kernels.

Capabilities of the reference's Cython/CUDA NMS
(/root/reference/lib/nms/cpu_nms.pyx:17-68, nms_kernel.cu:45-155) and
PyramidBox-style bbox_vote (/root/reference/lib/test.py:181-217).
A C++ implementation (csrc/) can be loaded for large inputs; numpy is the
reference implementation and the test oracle.
"""

from __future__ import annotations

import numpy as np


def nms(dets, thresh):
    """Greedy NMS. dets: (N, 5) [x1, y1, x2, y2, score]; assumes rows may be
    unsorted; returns kept indices into dets in descending-score order."""
    if dets.shape[0] == 0:
        return []
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


def bbox_vote(det, thresh):
    """Score-weighted box merging: repeatedly cluster everything with
    IoU >= thresh against the current best box, replace the cluster by the
    score-weighted mean box carrying the cluster's max score. Singleton
    clusters are kept only when they exhaust the list — matching the
    reference's control flow (/root/reference/lib/test.py:181-217) including
    the dummy (10,10,20,20,1e-4) fallback for empty input."""
    det = np.asarray(det, dtype=np.float64)
    order = det[:, 4].argsort()[::-1]
    det = det[order]
    dets = None
    if det.shape[0] == 0:
        dets = np.array([[10, 10, 20, 20, 0.0001]])
        det = np.empty((0, 5))
    while det.shape[0] > 0:
        area = (det[:, 2] - det[:, 0] + 1) * (det[:, 3] - det[:, 1] + 1)
        xx1 = np.maximum(det[0, 0], det[:, 0])
        yy1 = np.maximum(det[0, 1], det[:, 1])
        xx2 = np.minimum(det[0, 2], det[:, 2])
        yy2 = np.minimum(det[0, 3], det[:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (area[0] + area - inter)
        merge_index = np.where(iou >= thresh)[0]
        cluster = det[merge_index]
        det = np.delete(det, merge_index, axis=0)
        if merge_index.shape[0] <= 1:
            # Reference keeps a singleton only when it's the final cluster.
            if det.shape[0] == 0:
                dets = cluster if dets is None else np.vstack((dets, cluster))
            continue
        weighted = cluster[:, 0:4] * cluster[:, 4:5]
        merged = np.zeros((1, 5))
        merged[0, 0:4] = weighted.sum(axis=0) / cluster[:, 4].sum()
        merged[0, 4] = cluster[:, 4].max()
        dets = merged if dets is None else np.vstack((dets, merged))
    if dets is None:
        dets = np.empty((0, 5))
    return dets
