"""Bisect the fused whole-pyramid program (VERDICT r4 item 4).

The inference analog of tools/train_time.py: the fused program bundles
per-level device preprocessing (scale_and_translate), the detector
forward, decode/top-k, the cross-level merge, and the device bbox_vote
into ONE dispatch — bench.py's compute_mfu (0.39) vs the bare forward's
0.55 band-masked MFU left ~30% of the on-chip wall unattributed.

Method: truncated variants of TPUDetector._build_run (the _truncate hook)
with the raw image device-resident and a 1-element readback, walls
RTT-subtracted (tools/measure.wall), cumulative per stage:

  preproc   -> resize+mean+mask (+flip mirror) for every level
  +forward  -> the detector forward per level
  +decode   -> decode/clip/threshold/per-level top-k + merge
  +vote     -> the full production program (top-K + device bbox_vote)

plus a per-level prefix bisection at the +forward stage to attribute the
forward wall across pyramid levels. Timing discipline per the verify
skill: per-delta noise ~±RTT/reps; the cumulative column is the truth.

Usage (real TPU): python -m smallhardface_tpu.tools.pyramid_time
    [--size 768 1024] [--reps 8] [--weights PATH]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

STAGES = ("preproc", "forward", "decode", None)
LABELS = {"preproc": "preproc", "forward": "+forward",
          "decode": "+decode", None: "+vote (full)"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[768, 1024],
                    help="source image (H W) — levels follow TEST.SCALES")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--weights", default="",
                    help="weights .npz/.caffemodel (default: newest "
                         "output/**/final.npz, else bg-biased random)")
    ap.add_argument("--fast-k", type=int, default=None,
                    help="override TPU.DECODE_FAST_K (0 = full top-k)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from smallhardface_tpu.config import cfg, cfg_from_file
    cfg_from_file(os.path.join(
        REPO, "smallhardface_tpu", "configs", "smallhardface.toml"))
    if args.fast_k is not None:
        cfg.TPU.DECODE_FAST_K = args.fast_k

    from smallhardface_tpu.detect import TPUDetector
    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.tools import measure

    spec = dm.build_spec(cfg)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    from smallhardface_tpu.io.checkpoint import find_trained_weights
    cands = (([args.weights] if args.weights else [])
             + find_trained_weights(REPO))
    weights = None
    for cand in cands:
        if os.path.exists(cand):
            if cand.endswith(".caffemodel"):
                from smallhardface_tpu.io import caffemodel
                params = caffemodel.load_into_params(cand, params)
            else:
                from smallhardface_tpu.io import checkpoint
                params = checkpoint.load_params(cand, params)
            weights = cand
            break
    if weights is None:
        for k in (1, 2, 4):
            params[f"cls_score_{k}"]["b"] = jnp.asarray([5.0, -5.0])
    print(f"# weights: {weights or 'random-init (bg-biased)'}")

    # representative stamped image (bench.py's generator)
    h, w = args.size
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import synth_wider
    rng = np.random.RandomState(0)
    im = rng.randint(95, 125, (h, w, 3), dtype=np.uint8)
    patches = synth_wider.make_images(3, 160, 1, seed=7,
                                      min_face=48, max_face=120)
    for k, (p, _) in enumerate(patches):
        im[(k + 1) * h // 4 - 80:(k + 1) * h // 4 + 80,
           (k + 1) * w // 4 - 80:(k + 1) * w // 4 + 80] = p

    det = TPUDetector(params, spec)
    prep = det._prep(im)
    key = prep["key"]
    level_buckets, flip, vote_method = key[2], key[3], key[4]
    print(f"# source {h}x{w}; levels {list(level_buckets)}; flip={flip}; "
          f"vote={vote_method}; mask={key[5] if len(key) > 5 else '?'}")

    raw = jax.device_put(jnp.asarray(prep["padded"]))
    fargs = (det.params, det.qstate, raw, jnp.asarray(prep["inv_fx"]),
             jnp.asarray(prep["h_s"]), jnp.asarray(prep["w_s"]),
             jnp.asarray(prep["vh"]), jnp.asarray(prep["vw"]),
             jnp.float32(cfg.TEST.SCORE_THRESH), jnp.float32(0.05),
             jnp.float32(cfg.TEST.NMS_THRESH))
    rtt = measure.rtt_baseline(args.reps)
    print(f"# null dispatch+readback (RTT baseline): {rtt*1e3:.1f} ms")

    flops = sum(dm.forward_flops(spec, hb, wb, batch=2 if flip else 1)
                for hb, wb in level_buckets)

    # ---- cumulative stage bisection
    print(f"{'stage':14s} {'cum ms':>8s} {'delta ms':>9s}")
    prev = 0.0
    walls = {}
    for st in STAGES:
        fn = jax.jit(det._build_run(level_buckets, flip, vote_method,
                                    _truncate=st))
        t = max(measure.wall(fn, fargs, args.reps) - rtt, 0.0)
        walls[st] = t
        print(f"{LABELS[st]:14s} {t*1e3:8.1f} {(t - prev)*1e3:9.1f}")
        prev = t
    full = walls[None]
    fwd_tf = flops / max(walls['forward'], 1e-9) / 1e12
    print(f"# model FLOPs {flops/1e12:.2f} TF; forward-stage TF/s "
          f"{fwd_tf:.1f} (MFU {fwd_tf/197:.2f}); full-program MFU "
          f"{flops/max(full,1e-9)/1e12/197:.2f}")
    print(f"# non-forward share: preproc {walls['preproc']*1e3:.1f} ms, "
          f"decode+merge {(walls['decode']-walls['forward'])*1e3:.1f} ms, "
          f"vote {(full-walls['decode'])*1e3:.1f} ms "
          f"of {full*1e3:.1f} ms total")

    # ---- per-level prefix bisection at the +forward stage
    print(f"{'levels':14s} {'cum ms':>8s} {'delta ms':>9s} "
          f"{'level flops TF':>14s}")
    prev = 0.0
    for k in range(1, len(level_buckets) + 1):
        fn = jax.jit(det._build_run(level_buckets[:k], flip, vote_method,
                                    _truncate="forward"))
        t = max(measure.wall(fn, fargs, args.reps) - rtt, 0.0)
        hb, wb = level_buckets[k - 1]
        lf = dm.forward_flops(spec, hb, wb, batch=2 if flip else 1)
        print(f"L0..L{k-1:<8d} {t*1e3:8.1f} {(t - prev)*1e3:9.1f} "
              f"{lf/1e12:14.2f}")
        prev = t


if __name__ == "__main__":
    main()
