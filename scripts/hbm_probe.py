"""Peak-HBM probe for the fused pyramid program (VERDICT r4 item 3).

Compile-time memory analysis (no allocation, no OOM risk) of the batched
detect_many program at WIDER shapes, for batch 1/2/4 with TPU.LEVEL_SERIAL
on and off — then a timed detect_many pass at the largest batch that fits.

MEASURED (PERF_NOTES r4): the level-serialization barriers (detect.py
_build_run) do NOT change peak HBM — XLA's scheduler already orders the
levels memory-minimally, so the pyramid peaks at max-over-levels either
way (~1.2 GiB/image; B=4 = 4.9 GiB at 1024x1530 — round 3's "B=3 OOMs a
16 GB v5e" does not reproduce). Their real effect is compile time on the
big batched programs: serial B=4 compiles in 89 s vs 932 s without.

Usage (real TPU, one process at a time):
    python scripts/hbm_probe.py [--timed-batch 4] [--no-timed]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fmt_gb(b):
    return f"{b / 2**30:.2f} GiB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timed-batch", type=int, default=4)
    ap.add_argument("--no-timed", action="store_true")
    ap.add_argument("--shape", type=str, default="768x1024",
                    help="HxW of the synthetic input image")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from smallhardface_tpu.config import cfg, cfg_from_file
    cfg_from_file(os.path.join(REPO, "smallhardface_tpu", "configs",
                               "smallhardface.toml"))
    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.detect import TPUDetector

    spec = dm.build_spec(cfg)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    for k in (1, 2, 4):
        params[f"cls_score_{k}"]["b"] = jnp.asarray([5.0, -5.0])

    h, w = (int(x) for x in args.shape.split("x"))
    rng = np.random.RandomState(0)
    im = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)

    det = TPUDetector(params, spec)
    p = det._prep(im)
    print(f"# image {h}x{w}, pyramid buckets: {p['key'][2]}", flush=True)

    aval = lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
    params_avals = jax.tree.map(aval, det.params)

    results = {}
    for serial in (True, False):
        cfg.TPU.LEVEL_SERIAL = serial
        det._compiled_dev.clear()
        pp = det._prep(im)          # key embeds LEVEL_SERIAL
        for batch in (1, 2, 4):
            fn = det._pyramid_program_batched(pp["key"], batch)
            bat = lambda name: jax.ShapeDtypeStruct(
                (batch,) + np.shape(pp[name]),
                np.asarray(pp[name]).dtype)
            t0 = time.time()
            lowered = fn.lower(
                params_avals, None, bat("padded"), bat("inv_fx"),
                bat("h_s"), bat("w_s"), bat("vh"), bat("vw"),
                jax.ShapeDtypeStruct((), np.float32),
                jax.ShapeDtypeStruct((), np.float32),
                jax.ShapeDtypeStruct((), np.float32))
            mem = lowered.compile().memory_analysis()
            dt = time.time() - t0
            temp = mem.temp_size_in_bytes
            arg = mem.argument_size_in_bytes
            out = mem.output_size_in_bytes
            peak = temp + arg + out
            results[(serial, batch)] = peak
            print(f"serial={serial!s:5} B={batch}: temp {fmt_gb(temp)}, "
                  f"args {fmt_gb(arg)}, out {fmt_gb(out)} -> peak "
                  f"{fmt_gb(peak)}  (compile {dt:.0f}s)", flush=True)

    cfg.TPU.LEVEL_SERIAL = True
    for b in (2, 4):
        r = results.get((False, b), 0) / max(results.get((True, b), 1), 1)
        print(f"# serialization cuts B={b} peak by {r:.2f}x", flush=True)

    if args.no_timed:
        return
    # ---- timed pass at the largest fitting batch (serial on) ----
    det._compiled_dev.clear()
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for _ in range(8)]
    bmax = args.timed_batch
    print(f"# warmup (compile + first readback, can take minutes)...",
          flush=True)
    for mb in (1, 2, bmax):
        det.detect_many(imgs[:mb], thresh=0.05, max_batch=mb)
    for mb in (1, 2, bmax):
        t0 = time.time()
        det.detect_many(imgs, thresh=0.05, max_batch=mb)
        dt = time.time() - t0
        print(f"detect_many max_batch={mb}: {len(imgs)} imgs in {dt:.2f}s "
              f"= {len(imgs)/dt:.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
