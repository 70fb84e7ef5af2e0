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


def hbm_bandwidth(gb=2.0, loops=16, reps=6):
    """Measured achievable HBM read+write bandwidth (bytes/s): a
    sequential in-program loop of `loops` fused elementwise passes over a
    `gb`-sized fp32 array (each iteration reads and writes the full
    array; the multiply-add carry chain prevents any cross-iteration
    fusion), so on-chip time dwarfs the ~30 ms tunnel RTT that a single
    pass would drown in. Roofline denominator for the int8 retirement
    study (PERF_NOTES r4)."""
    from jax import lax

    n = int(gb * 2**30 / 4)
    x = jax.device_put(jnp.zeros((n,), jnp.float32))
    f = jax.jit(lambda v: lax.fori_loop(
        0, loops, lambda i, y: y * 1.0000001 + 1e-7, v))
    t = wall(f, (x,), reps)
    return 2.0 * loops * n * 4 / t, t


def wall_roundrobin(named, reps=10):
    """{name: median wall} with the entries sampled round-robin so the
    tunnel's minute-scale weather hits every entry equally — the
    trustworthy way to DIFFERENCE two walls (e.g. int8 vs fp32 vs a null
    dispatch). named = [(name, fn, args), ...]; all fns are warmed (and
    their first readback absorbed) before timing."""
    import time

    for _, fn, args in named:
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = {nm: [] for nm, _, _ in named}
    for _ in range(reps):
        for nm, fn, args in named:
            t0 = time.time()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            ts[nm].append(time.time() - t0)
    return {nm: float(np.median(v)) for nm, v in ts.items()}


def chain_stage_list(vgg_stages):
    """vgg_stage_list minus the conv1 stage and pool1 — the serving int8
    chain's domain (the fp32 Pallas stem owns conv1_1..pool1)."""
    return [nm for nm in vgg_stage_list(vgg_stages)
            if not nm.startswith("conv1") and nm != "pool1"]


def make_chain_fn(stage_names, k, int8=False, qstate=None):
    """Jitted truncated post-stem VGG chain over the first k entries of
    stage_names (which start at conv2_1; input is a pool1-shaped carrier:
    fp32, or an int8 carrier on conv2_1's calibrated grid when int8).

    int8=True mirrors the serving chain exactly (detector.forward's
    calibrated static mode): conv2d_int8_chain links re-quantizing onto
    the successor's grid, max-pool directly on the int8 carrier; the last
    link dequantizes to fp32. Returns a scalar (defeats DCE)."""
    from smallhardface_tpu.models.layers import (conv2d, conv2d_int8_chain,
                                                 max_pool_2x2)

    names = stage_names[:k]
    convs = [nm for nm in names if not nm.startswith("pool")]

    if not int8:
        def run(p, q):
            h = q
            for nm in names:
                if nm.startswith("pool"):
                    h = max_pool_2x2(h)
                else:
                    h = jax.nn.relu(conv2d(
                        h, p[nm]["w"], p[nm]["b"], padding=1))
            return h.astype(jnp.float32).sum()

        return jax.jit(run)

    succ = dict(zip(convs, convs[1:]))

    def run(p, q):
        h = q
        for nm in names:
            if nm.startswith("pool"):
                h = max_pool_2x2(h)
                continue
            nxt = succ.get(nm)
            h = conv2d_int8_chain(
                h, qstate["qw"][nm],
                qstate["scales"][nm] / 127.0, qstate["s_w"][nm],
                p[nm]["b"], padding=1,
                s_out=(None if nxt is None
                       else qstate["scales"][nxt] / 127.0))
        return h.astype(jnp.float32).sum()

    return jax.jit(run)
