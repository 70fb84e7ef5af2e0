"""Full-forward int8 vs fp32 walls, round-robin (VERDICT r4 item 4).

The round-robin chain bisect (layer_time --bisect --int8-chain) measured
the calibrated int8 chain at ~430 TF/s = the int8 MXU peak, 2.57x the
fp32 chain — so round 3's "int8 only wins 4-5% end-to-end" deserves a
re-measurement with the tunnel-weather-robust harness: null / fp32 /
int8 full forwards sampled round-robin, medians differenced.

Usage: python scripts/int8_e2e_probe.py [--size 1408 1920] [--reps 10]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1408, 1920])
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from smallhardface_tpu.config import cfg  # noqa: F401  (defaults)
    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.tools import measure

    h, w = args.size
    B = args.batch
    spec = dm.ModelSpec(different_dilation=True)
    params = jax.device_put(dm.init_params(jax.random.PRNGKey(3), spec))
    amax = {n: 1.0 for n in dm.int8_layer_names(spec)}
    qstate = jax.device_put(dm.make_qstate(params, spec, amax))
    x = jax.device_put(jnp.zeros((B, h, w, 3), jnp.float32))

    def mk(cd, q, pallas):
        def run(p, xx):
            out = dm.forward(p, xx, spec, compute_dtype=cd, qstate=q,
                             pallas_stem=pallas)
            return out["cls_logits"].sum() + out["bbox_deltas"].sum()
        return jax.jit(run)

    entries = [
        ("null", jax.jit(lambda v: v + 1.0),
         (jnp.zeros((8,), jnp.float32),)),
        ("fp32+pallas", mk(None, None, True), (params, x)),
        ("int8+pallas", mk("int8", qstate, True), (params, x)),
        ("int8 dynamic", mk("int8", None, True), (params, x)),
        ("bf16+pallas", mk(jnp.bfloat16, None, True), (params, x)),
    ]
    walls = measure.wall_roundrobin(entries, reps=args.reps)
    null = walls.pop("null")
    fl = dm.forward_flops(spec, h, w, batch=B)
    print(f"# {h}x{w} B={B}, unmasked, RTT(null)={null*1e3:.1f} ms, "
          f"fwd {fl/1e12:.2f} TFLOP")
    for nm, t in walls.items():
        c = t - null
        print(f"  {nm:14s} wall {t*1e3:7.1f} ms   compute {c*1e3:6.1f} ms"
              f"   {fl/max(c,1e-9)/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
