"""On-device greedy NMS with static shapes.

Device analog of the reference's CUDA bitmask NMS
(/root/reference/lib/nms/nms_kernel.cu:45-155): boxes are sorted by score,
then a sequential suppression sweep marks every lower-scored box whose IoU
with an unsuppressed earlier box exceeds the threshold. The sweep runs as a
fori_loop of O(N) vector steps on the VPU — same asymptotics as the CUDA
kernel's host-side mask walk, with the IoU rows computed on the fly.

Used for the TRAIN-phase proposal path (proposal_layer.py:195-202) and the
TEST NMS_METHOD="NMS" alternative, keeping those flows free of host
round-trips. Results match ops.nms_np.nms on distinct scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def nms_device(boxes, scores, iou_thresh, n_valid=None, max_out=None):
    """boxes: (N, 4); scores: (N,); n_valid: scalar count of real rows
    (rows beyond are padding). Returns (keep_idx (M,), keep_mask (M,),
    n_keep) where M = max_out or N: indices into the ORIGINAL arrays in
    descending-score order, padded with 0 beyond n_keep."""
    n = boxes.shape[0]
    if n_valid is None:
        n_valid = n
    order = jnp.argsort(-scores)
    b = boxes[order]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    idx = jnp.arange(n)
    valid = idx < n_valid          # sorted rows: padding has -inf scores?
    # padding rows must sort last: caller guarantees padded scores = -inf
    suppressed = ~valid

    def body(i, suppressed):
        alive = ~suppressed[i]
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        w = jnp.maximum(0.0, xx2 - xx1 + 1)
        h = jnp.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        kill = alive & (iou > iou_thresh) & (idx > i)
        return suppressed | kill

    suppressed = lax.fori_loop(0, n, body, suppressed)
    keep_mask = ~suppressed & valid
    n_keep = keep_mask.sum()
    # stable-compact kept indices to the front (descending score order);
    # dropped rows scatter out of range
    m = max_out or n
    rank = jnp.where(keep_mask, jnp.cumsum(keep_mask) - 1, m)
    keep_idx = jnp.zeros(m, dtype=order.dtype)
    keep_idx = keep_idx.at[rank].set(order, mode="drop")
    slot = jnp.arange(m)
    return keep_idx, slot < jnp.minimum(n_keep, m), jnp.minimum(n_keep, m)
