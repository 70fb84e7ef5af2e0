#!/usr/bin/env python3
"""Dump compiled-HLO stats for the forward under each mask mode — evidence
for where the masking wall-time goes (copies? broken fusions? extra
kernels?) — then wall-time the promising variants with real dispatches.

NOT compile-only: the timing section executes on the attached TPU with
D2H readbacks (first readback can stall minutes through the tunnel).
Run it alone — never alongside another TPU process (CLAUDE.md)."""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from smallhardface_tpu.models import detector as dm

H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (1408, 1920)
spec = dm.ModelSpec(different_dilation=True)
params = dm.init_params(jax.random.PRNGKey(3), spec)
x = jnp.zeros((1, H, W, 3), jnp.float32)


def stats(mode):
    if mode == "none":
        def run(p, xx, vh, vw):
            return dm.forward(p, xx, spec)
    else:
        def run(p, xx, vh, vw):
            return dm.forward(p, xx, spec, valid_hw=(vh, vw),
                              mask_mode=mode)
    # -32: respects the band_margin contract (valid + 4*stride8 <= bucket)
    compiled = jax.jit(run).lower(
        params, x, jnp.int32(H - 32), jnp.int32(W - 32)).compile()
    txt = compiled.as_text()
    ops = collections.Counter()
    # entry-computation instruction opcodes (rough but comparable)
    for m in re.finditer(r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = \S+ (\w+)\(", txt,
                         re.M):
        ops[m.group(1)] += 1
    mem = compiled.memory_analysis()
    print(f"--- {mode} ---")
    print("total instrs:", sum(ops.values()))
    for k in ("fusion", "copy", "convolution", "dynamic-slice",
              "dynamic-update-slice", "select", "reduce-window"):
        print(f"  {k}: {ops.get(k, 0)}")
    if mem is not None:
        print("  temp MB:", round(mem.temp_size_in_bytes / 1e6, 1),
              " output MB:", round(mem.output_size_in_bytes / 1e6, 1))
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print("  cost flops:", ca.get("flops"),
              " bytes accessed:", ca.get("bytes accessed"))
    except Exception as e:
        print("  cost analysis unavailable:", e)
    return txt


import time

for mode in ("none", "band_margin", "band", "where"):
    txt = stats(mode)
    with open(f"/tmp/hlo_{mode}.txt", "w") as f:
        f.write(txt)

# wall-clock check (median of 6, tiny readback)
for mode in ("none", "band_margin", "where"):
    if mode == "none":
        def run(p, xx, vh, vw):
            return dm.forward(p, xx, spec)
    else:
        def run(p, xx, vh, vw, mode=mode):
            return dm.forward(p, xx, spec, valid_hw=(vh, vw),
                              mask_mode=mode)
    fn = jax.jit(run)
    args = (params, x, jnp.int32(H - 32), jnp.int32(W - 32))
    out = fn(*args)
    # device-side slice first — transferring the whole tensor through the
    # ~30 MB/s tunnel just to warm up is the pattern the repo notes warn
    # about (matches the timed loop below)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    walls = []
    for _ in range(6):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        walls.append(time.time() - t0)
    print(f"wall {mode}: {np.median(walls)*1e3:.2f} ms")
