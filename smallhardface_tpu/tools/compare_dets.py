"""Compare two detections.pkl files (e.g. converted-weights run vs a
reference run) — the parity-debugging companion to the detections cache
(/root/reference/lib/test.py:303-316 caching contract:
all_boxes[class][image] = (N, 5)).

Usage: python -m smallhardface_tpu.tools.compare_dets a.pkl b.pkl
           [--iou 0.5] [--score-tol 0.01]
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def _one_way(a, b, iou_thresh, score_tol):
    from smallhardface_tpu.ops import bbox_np
    iou = bbox_np.bbox_overlaps(a[:, :4], b[:, :4])
    best = iou.argmax(axis=1)
    ok = (iou[np.arange(len(a)), best] >= iou_thresh) & \
         (np.abs(a[:, 4] - b[best, 4]) <= score_tol)
    return float(ok.mean())


def match_rate(a, b, iou_thresh, score_tol):
    """Symmetric match rate: min over both directions, so both missing and
    spurious detections lower the score."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    return min(_one_way(a, b, iou_thresh, score_tol),
               _one_way(b, a, iou_thresh, score_tol))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--score-tol", type=float, default=0.01)
    args = p.parse_args()

    with open(args.a, "rb") as f:
        da = pickle.load(f)
    with open(args.b, "rb") as f:
        db = pickle.load(f)
    assert len(da) == len(db), "class count mismatch"
    for cls in range(1, len(da)):
        n_img = len(da[cls])
        assert n_img == len(db[cls]), "image count mismatch"
        rates, count_a, count_b = [], 0, 0
        for i in range(n_img):
            a = np.asarray(da[cls][i]).reshape(-1, 5)
            b = np.asarray(db[cls][i]).reshape(-1, 5)
            count_a += len(a)
            count_b += len(b)
            rates.append(match_rate(a, b, args.iou, args.score_tol))
        if not rates:
            print(f"class {cls}: no images")
            continue
        print(f"class {cls}: images {n_img}, dets {count_a} vs {count_b}, "
              f"mean match-rate {np.mean(rates):.4f}, "
              f"worst image {np.argmin(rates)} ({np.min(rates):.4f})")


if __name__ == "__main__":
    main()
