"""Pallas max-IoU kernel vs the numpy / chunked-scan oracles
(interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from smallhardface_tpu.ops import bbox_np
from smallhardface_tpu.ops.pallas_iou import pallas_max_iou


def _fixtures(rng, n, g, g_cap=64):
    anchors = rng.uniform(0, 300, (n, 4))
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 80, (n, 2))
    gt = np.zeros((g_cap, 4))
    gt[:g, :2] = rng.uniform(0, 300, (g, 2))
    gt[:g, 2:] = gt[:g, :2] + rng.uniform(5, 80, (g, 2))
    mask = np.zeros(g_cap, bool)
    mask[:g] = True
    return anchors, gt, mask


@pytest.mark.parametrize("n,g", [(100, 3), (1024, 17), (2500, 64)])
def test_pallas_iou_matches_numpy(rng, n, g):
    anchors, gt, mask = _fixtures(rng, n, g)
    best, idx = pallas_max_iou(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(mask),
        interpret=True)
    full = bbox_np.bbox_overlaps(anchors, gt[:g])
    np.testing.assert_allclose(np.asarray(best), full.max(axis=1),
                               rtol=1e-5, atol=1e-6)
    want_idx = full.argmax(axis=1)
    unique = (full == full.max(axis=1, keepdims=True)).sum(axis=1) == 1
    np.testing.assert_array_equal(np.asarray(idx)[unique], want_idx[unique])


def test_pallas_iou_no_gt(rng):
    anchors, gt, mask = _fixtures(rng, 64, 0)
    best, idx = pallas_max_iou(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(mask),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(best), 0.0)
