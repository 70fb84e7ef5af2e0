"""Evidence probes for the round-3 perf questions (VERDICT r2 weak #1/#6):

1. MATMUL PRECISION: does the default fp32 path execute as one bf16 MXU
   pass (then the honest MFU denominator is the bf16 peak) or as a
   multi-pass fp32 emulation (then the fp32-effective peak stands)?
   Measured directly: a large square matmul timed under default fp32,
   explicit bf16, and fp32 "highest" (the 6-pass emulation). Walls are
   taken around a 1-element readback; the tunnel RTT is measured with a
   null dispatch and subtracted.

2. STEM BISECTION: the per-layer cost model (tools/layer_time.py) charges
   the C=3 stem 22% of cycles but is calibrated ~3x off absolute. Run
   TRUNCATED forwards (prefixes of the VGG stack, unmasked) and difference
   the walls — a real, model-free per-stage attribution.

Usage: python scripts/stem_probe.py [--h 1408] [--w 1920] [--reps 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax

# persistent compile cache: 17 truncated-forward programs otherwise
# recompile on every probe run
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

print = functools.partial(print, flush=True)

from smallhardface_tpu.models import detector as dm


from smallhardface_tpu.tools.measure import wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1408)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--n", type=int, default=8192, help="matmul dim")
    ap.add_argument("--skip-bisect", action="store_true")
    ap.add_argument("--full-forward", action="store_true",
                    help="also time the complete detector forward "
                    "(fusion+heads) to localize the non-VGG residual")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    from smallhardface_tpu.tools.measure import rtt_baseline
    rtt = rtt_baseline(args.reps)
    print(f"null dispatch+readback: {rtt*1e3:.1f} ms")

    # ---- 1. matmul precision probe ----
    n = args.n
    flops = 2.0 * n * n * n
    key = jax.random.PRNGKey(0)
    a32 = jax.random.normal(key, (n, n), jnp.float32)
    b32 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
    a16, b16 = a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16)

    mm_default = jax.jit(lambda a, b: a @ b)
    mm_highest = jax.jit(
        lambda a, b: jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST))
    # int8: does XLA route integer dots to the MXU's 394 TOPS int8 path?
    # (the v5e spec doubles the bf16 rate; answer decides whether a
    # quantized serving mode is worth building)
    a8 = (a32 * 10).astype(jnp.int8)
    b8 = (b32 * 10).astype(jnp.int8)
    mm_int8 = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.int32))
    for label, fn, fa, fb in (
            ("fp32 default", mm_default, a32, b32),
            ("bf16", mm_default, a16, b16),
            ("fp32 HIGHEST", mm_highest, a32, b32),
            ("int8->int32", mm_int8, a8, b8)):
        t = wall(fn, (fa, fb), args.reps) - rtt
        print(f"matmul {n}^3 {label:14s}: {t*1e3:7.1f} ms  "
              f"{flops/t/1e12:6.1f} TF/s")

    if args.full_forward:
        spec = dm.ModelSpec(different_dilation=True)
        params = jax.device_put(dm.init_params(jax.random.PRNGKey(3), spec))
        x = jax.device_put(jnp.zeros((1, args.h, args.w, 3), jnp.float32))
        for label, kw in (("unmasked", dict()),
                          ("band_margin", dict(
                              valid_hw=(args.h - 32, args.w - 32),
                              mask_mode="band_margin"))):
            f = jax.jit(lambda p, xx, kw=kw: jax.tree_util.tree_map(
                jnp.sum, dm.forward(p, xx, spec, **kw)))
            t = wall(f, (params, x), args.reps)
            print(f"full forward {label:12s}: {t*1e3:7.1f} ms "
                  f"(compute ~{(t-rtt)*1e3:.1f} ms)")

    if args.skip_bisect:
        return

    # ---- 2. truncated-forward bisection ----
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    params = jax.device_put(params)
    x = jax.device_put(jnp.zeros((1, args.h, args.w, 3), jnp.float32))

    from smallhardface_tpu.tools.measure import (
        vgg_stage_list, make_prefix_fn)
    stages = vgg_stage_list(dm.VGG_STAGES)

    def make_prefix(k):
        return make_prefix_fn(stages, k)

    shapes = dm.param_shapes(spec)

    def gflop_of(nm, s):
        kh, kw, ci, co = shapes[nm]["w"]
        import math
        hs, ws = math.ceil(args.h / s), math.ceil(args.w / s)
        return 2.0 * hs * ws * kh * kw * ci * co / 1e9

    prev = rtt
    s = 1
    print(f"\ntruncated forwards @ {args.h}x{args.w} (delta = this stage):")
    for k in range(1, len(stages) + 1):
        nm = stages[k - 1]
        t = wall(make_prefix(k), (params, x), args.reps)
        d = t - prev
        if nm.startswith("pool"):
            gf, eff = 0.0, 0.0
        else:
            gf = gflop_of(nm, s)
            eff = gf / 1e3 / max(d, 1e-9)
        print(f"  {nm:10s} cum {t*1e3:7.1f} ms   Δ {d*1e3:6.1f} ms   "
              f"{gf:7.1f} GF  {eff:6.1f} TF/s")
        prev = t
        if nm.startswith("pool"):
            s *= 2


if __name__ == "__main__":
    main()
