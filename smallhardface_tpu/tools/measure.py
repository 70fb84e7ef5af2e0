"""Shared wall-clock measurement helpers for the on-chip probes
(tools/layer_time.py --bisect and scripts/stem_probe.py).

Tunnel discipline (CLAUDE.md): `block_until_ready` does not block through
the axon tunnel, so every wall is taken around a 1-element device-side
slice readback; a null dispatch calibrates the RTT baseline. Matmul/conv
walls are only trustworthy when compute ≫ the ~30 ms RTT — prefer paired
same-process differences for small quantities.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def wall(fn, args, reps=8):
    """Median wall of fn(*args) incl. a tiny readback (forces completion)."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def rtt_baseline(reps=8):
    """Null dispatch + 1-element readback: the tunnel round-trip floor."""
    return wall(jax.jit(lambda v: v + 1.0),
                (jnp.zeros((8,), jnp.float32),), reps)


def vgg_stage_list(vgg_stages):
    """['conv1_1', 'conv1_2', 'pool1', ...] in forward order (pools after
    every stage but the last, matching models/detector.forward)."""
    names = []
    for stage, _, cnt in vgg_stages:
        names.extend(f"{stage}_{i}" for i in range(1, cnt + 1))
        if stage != "conv5":
            names.append(f"pool{stage[4:]}")
    return names


def make_prefix_fn(stage_names, k):
    """Jitted truncated VGG forward over the first k stage_names entries;
    returns a scalar (tiny readback, defeats DCE)."""
    from smallhardface_tpu.models.layers import conv2d, max_pool_2x2

    names = stage_names[:k]

    def run(p, xx):
        h = xx
        for nm in names:
            if nm.startswith("pool"):
                h = max_pool_2x2(h)
            else:
                h = jax.nn.relu(conv2d(
                    h, p[nm]["w"], p[nm]["b"], padding=1))
        return h.sum()

    return jax.jit(run)
