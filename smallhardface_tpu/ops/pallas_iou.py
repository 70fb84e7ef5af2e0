"""Pallas TPU kernel: per-anchor max-IoU (and argmax) against a gt set.

The training target assignment needs, for every dense anchor (up to ~190k
at the largest scale), the best-overlapping ground-truth box — the job the
reference did on host with Cython (/root/reference/lib/utils/bbox.pyx:16-70)
and that ops.bbox_jax.max_iou_chunked does with a lax.scan materializing an
(N, chunk) IoU slab in HBM per step. This kernel keeps everything in
VMEM/SMEM: anchors stream through in (8, 128) tiles, the gt coordinates sit
in SMEM via scalar prefetch, and a fori_loop over gts updates the running
(max, argmax) registers. No IoU matrix ever touches HBM.

Used when gt count fits the SMEM budget (≤ 512 boxes); larger crowds fall
back to the chunked-scan path. Matches bbox_overlaps numerics (+1 pixel
convention; masked gts get IoU -1 so argmax prefers real boxes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8
LANE = 128
TILE = SUBLANE * LANE            # anchors per grid step
MAX_SMEM_GT = 512


def _kernel(gt_ref, ng_ref, ax1, ay1, ax2, ay2, best_ref, idx_ref):
    """gt_ref: SMEM (MAX_SMEM_GT, 4) scalar-prefetch; ng_ref: SMEM (1,)
    actual gt count; anchor tiles + outputs are (8, 128) VMEM blocks."""
    x1, y1, x2, y2 = ax1[...], ay1[...], ax2[...], ay2[...]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    n_gt = ng_ref[0]

    def body(g, carry):
        best, best_idx = carry
        gx1 = gt_ref[g, 0]
        gy1 = gt_ref[g, 1]
        gx2 = gt_ref[g, 2]
        gy2 = gt_ref[g, 3]
        g_area = (gx2 - gx1 + 1.0) * (gy2 - gy1 + 1.0)
        iw = jnp.minimum(x2, gx2) - jnp.maximum(x1, gx1) + 1.0
        ih = jnp.minimum(y2, gy2) - jnp.maximum(y1, gy1) + 1.0
        iw = jnp.maximum(iw, 0.0)
        ih = jnp.maximum(ih, 0.0)
        inter = iw * ih
        union = area + g_area - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        # masked gt rows are encoded degenerate (x2 < x1): IoU -1 so they
        # never win the argmax, matching max_iou_chunked's masking
        iou = jnp.where(gx2 >= gx1, iou, -1.0)
        take = iou > best
        return (jnp.where(take, iou, best),
                jnp.where(take, jnp.full_like(best_idx, g), best_idx))

    init = (jnp.full((SUBLANE, LANE), -1.0, jnp.float32),
            jnp.zeros((SUBLANE, LANE), jnp.int32))
    best, best_idx = lax.fori_loop(0, n_gt, body, init)
    best_ref[...] = best
    idx_ref[...] = best_idx


@functools.partial(jax.jit, static_argnames=("interpret", "vma"))
def pallas_max_iou(anchors, gt_boxes, gt_mask, interpret=False, vma=None):
    """anchors: (N, 4); gt_boxes: (G, 4) with G ≤ MAX_SMEM_GT;
    gt_mask: (G,) bool. Returns (max_iou (N,), argmax (N,) int32) with
    max clamped at 0 like max_iou_chunked. Under shard_map pass
    vma=(axis_name,) so the outputs carry the right varying-axis type."""
    n = anchors.shape[0]
    g = gt_boxes.shape[0]
    assert g <= MAX_SMEM_GT, f"gt count {g} exceeds SMEM budget"
    n_pad = (-n) % TILE
    a = jnp.pad(anchors.astype(jnp.float32), ((0, n_pad), (0, 0)))
    nt = (n + n_pad) // TILE
    coords = [a[:, i].reshape(nt * SUBLANE, LANE) for i in range(4)]

    # masked gts become degenerate boxes (x2 < x1 → kernel yields IoU -1),
    # and the fori upper bound skips trailing padding entirely
    degenerate = jnp.asarray([1e9, 1e9, -1e9, -1e9], jnp.float32)
    gt = jnp.where(gt_mask[:, None], gt_boxes.astype(jnp.float32),
                   degenerate[None, :])
    gt = jnp.concatenate(
        [gt, jnp.broadcast_to(degenerate, (MAX_SMEM_GT - g, 4))], axis=0)
    n_gt = jnp.maximum(
        jnp.where(gt_mask, jnp.arange(g) + 1, 0).max(), 0
    ).reshape(1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((SUBLANE, LANE), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=[
            pl.BlockSpec((SUBLANE, LANE), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANE, LANE), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    best, idx = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt * SUBLANE, LANE), jnp.float32,
                                 vma=frozenset(vma) if vma else None),
            jax.ShapeDtypeStruct((nt * SUBLANE, LANE), jnp.int32,
                                 vma=frozenset(vma) if vma else None),
        ],
        interpret=interpret,
    )(gt, n_gt, *coords)
    best = best.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    return jnp.maximum(best, 0.0), idx
