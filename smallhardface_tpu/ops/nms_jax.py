"""On-device greedy NMS and bbox_vote with static shapes.

Device analog of the reference's CUDA bitmask NMS
(/root/reference/lib/nms/nms_kernel.cu:45-155): boxes are sorted by score,
then a sequential suppression sweep marks every lower-scored box whose IoU
with an unsuppressed earlier box exceeds the threshold. The sweep runs as a
fori_loop of O(N) vector steps on the VPU — same asymptotics as the CUDA
kernel's host-side mask walk, with the IoU rows computed on the fly.

bbox_vote_device is the PyramidBox-style score-weighted cluster merge
(/root/reference/lib/test.py:181-217) as a lax.while_loop — one iteration
per cluster, each an O(V) vector step — including the reference's quirks:
the merged score is the cluster max, and singleton clusters are DROPPED
unless they exhaust the remaining list.

Both run inside the fused pyramid program (detect.py) so finalize reads
back only final detections; ops.nms_np holds the float64 host oracles.
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


def bbox_vote_device(dets, n_valid, thresh):
    """Score-weighted box voting on device (lib/test.py:181-217 semantics).

    dets: (V, 5) [x1, y1, x2, y2, score] sorted by DESCENDING score with
    padding rows beyond n_valid. Returns (out (V, 5), n_out): merged
    clusters in emission order. The caller supplies the reference's
    empty-input dummy row on the host when n_out == 0.

    Control-flow parity with the numpy oracle (ops.nms_np.bbox_vote):
      - the current head is always the highest-scoring remaining row
      - cluster = remaining rows with IoU >= thresh against the head
      - clusters of size >= 2 emit the score-weighted mean box carrying
        the cluster's max score
      - singleton clusters emit their own row ONLY when nothing remains
        afterwards (the reference's mid-stream singleton drop)
    """
    v = dets.shape[0]
    boxes = dets[:, :4]
    scores = dets[:, 4]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    remaining0 = jnp.arange(v) < n_valid

    def cond(state):
        remaining, _, _ = state
        return remaining.any()

    def body(state):
        remaining, out, cnt = state
        i = jnp.argmax(remaining)       # sorted input → highest remaining
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        w = jnp.maximum(0.0, xx2 - xx1 + 1)
        h = jnp.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (area[i] + area - inter)
        cluster = remaining & (iou >= thresh)
        csize = cluster.sum()
        new_remaining = remaining & ~cluster
        exhausted = ~new_remaining.any()
        cw = jnp.where(cluster, scores, 0.0)
        merged_box = (boxes * cw[:, None]).sum(axis=0) / cw.sum()
        merged_score = jnp.where(cluster, scores, -jnp.inf).max()
        merged = jnp.concatenate([merged_box, merged_score[None]])
        single = jnp.concatenate([boxes[i], scores[i][None]])
        row = jnp.where(csize > 1, merged, single)
        emit = (csize > 1) | exhausted
        out = out.at[cnt].set(jnp.where(emit, row, out[cnt]), mode="drop")
        return new_remaining, out, cnt + emit.astype(cnt.dtype)

    out0 = jnp.zeros((v, 5), dets.dtype)
    _, out, cnt = lax.while_loop(
        cond, body, (remaining0, out0, jnp.int32(0)))
    return out, cnt
