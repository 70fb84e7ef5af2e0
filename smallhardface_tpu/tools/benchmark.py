"""Model timing — the `caffe time` analog
(/root/reference/caffe/tools/caffe.cpp:339-427 timed per-layer fwd/bwd with
CUDA events). Under XLA the graph is fused, so per-layer walls don't exist;
this reports whole forward / forward+backward step times per shape, and can
dump a jax profiler trace for op-level analysis (the `caffe time`
use case — where is the time going — is served by the trace viewer).

Usage:
  python -m smallhardface_tpu.tools.benchmark [--height 608] [--width 912]
      [--batch 1] [--iters 20] [--train] [--bf16] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=912)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--train", action="store_true",
                   help="time forward+backward+update instead of forward")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--trace-dir", default="",
                   help="dump a jax profiler trace here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from smallhardface_tpu.models import detector as dm

    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    cd = jnp.bfloat16 if args.bf16 else None
    x = jnp.zeros((args.batch, args.height, args.width, 3), jnp.float32)

    if args.train:
        from smallhardface_tpu.train.losses import softmax_ce_with_ignore

        def loss(p, x):
            out = dm.forward(p, x, spec, compute_dtype=cd)
            logits = out["cls_logits"].reshape(-1, 2)
            labels = (jnp.arange(logits.shape[0]) % 3 - 1).astype(
                jnp.float32)
            return softmax_ce_with_ignore(logits, labels)

        fn = jax.jit(jax.grad(loss))
    else:
        fn = jax.jit(lambda p, x: dm.forward(p, x, spec, compute_dtype=cd))

    def sync(r):
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]

    t0 = time.time()
    sync(fn(params, x))
    print(f"compile+first: {time.time() - t0:.2f}s")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            sync(fn(params, x))
        print(f"profiler trace written to {args.trace_dir}")

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        sync(fn(params, x))
        times.append(time.time() - t0)
    times = np.array(times) * 1000
    mode = "fwd+bwd" if args.train else "forward"
    print(f"{mode} {args.batch}x{args.height}x{args.width} "
          f"({'bf16' if args.bf16 else 'f32'}): "
          f"mean {times.mean():.1f}ms p50 {np.percentile(times, 50):.1f}ms "
          f"min {times.min():.1f}ms")


if __name__ == "__main__":
    main()
