#!/usr/bin/env python3
"""Decompose detector compute time on the attached chip.

`caffe time`-style evidence for where the milliseconds go, measured
directly (the tunnel makes trace timestamps unreliable; wall-clock around
a tiny readback is the only trustworthy clock here — see
.claude/skills/verify/SKILL.md):

  - forward-only vs forward+decode+merge vs full program (+device vote)
  - float32 vs bfloat16 conv stack
  - valid-extent masking on vs off
  - detect_many batching (B images per dispatch) vs one-at-a-time

Usage: python -m smallhardface_tpu.tools.perf_probe [--size 1408 1920]
       [--iters 8]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timed(fn, args, iters):
    """Median wall of fn(*args) with a 1-element readback barrier."""
    outs = fn(*args)
    leaf = None
    import jax
    for x in jax.tree_util.tree_leaves(outs):
        leaf = x
        break
    np.asarray(leaf).ravel()[:1]          # absorb first-readback cost
    walls = []
    for _ in range(iters):
        t0 = time.time()
        outs = fn(*args)
        leaf = jax.tree_util.tree_leaves(outs)[0]
        np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)
        walls.append(time.time() - t0)
    return float(np.median(walls))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1408, 1920])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train", action="store_true",
                    help="also time the production train step "
                         "(768x1024 iter_size 1, 512x640 iter_size 2) "
                         "under both mask modes")
    ap.add_argument("--train-only", action="store_true",
                    help="skip the forward/batching probes (train-step "
                         "timing only)")
    ap.add_argument("--only", default=None,
                    help="run only forward probes whose label contains "
                         "one of these comma-separated substrings (and "
                         "skip the batching probe)")
    args = ap.parse_args()
    if args.train_only:
        args.train = True

    import jax
    import jax.numpy as jnp
    from smallhardface_tpu.config import cfg, cfg_from_file
    import os
    conf = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "smallhardface.toml")
    cfg_from_file(conf)
    from smallhardface_tpu.models import detector as dm

    h, w = args.size
    spec = dm.build_spec(cfg)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 30)
    flops = dm.forward_flops(spec, h, w)

    results = {}
    # masking variants: traced valid scalars, exactly like the production
    # programs (a Python-int valid would constant-fold the mask at trace
    # time and misrepresent the cost). valid = size-32 (the band_margin
    # bucket contract; representative for the others too).
    vh_t, vw_t = jnp.int32(h - 32), jnp.int32(w - 32)
    fwd_probes = () if args.train_only else (
            ("fwd_fp32_where", None, "where", False),
            ("fwd_fp32_band", None, "band", False),
            ("fwd_fp32_band_margin", None, "band_margin", False),
            ("fwd_fp32_unmasked", None, None, False),
            ("fwd_fp32_band_margin_pallas", None, "band_margin", True),
            ("fwd_fp32_unmasked_pallas", None, None, True),
            ("fwd_bf16_where", jnp.bfloat16, "where", False),
            ("fwd_bf16_band_margin", jnp.bfloat16, "band_margin", False),
            ("fwd_bf16_unmasked", jnp.bfloat16, None, False),
            # quantized serving mode (int8 MXU passes; requires
            # where/exact masking — band would couple padding garbage
            # into the dynamic activation scales). "static" = calibrated
            # qstate (fused elementwise quantizes + prebaked int8
            # weights); plain = dynamic per-tensor max-reduce scales.
            ("fwd_int8_where", "int8", "where", True),
            ("fwd_int8_unmasked", "int8", None, True),
            ("fwd_int8_static_where", "int8:static", "where", True),
            ("fwd_int8_static_unmasked", "int8:static", None, True))
    if args.only is not None:
        keys = [k for k in args.only.split(",") if k]
        fwd_probes = tuple(p for p in fwd_probes
                           if any(k in p[0] for k in keys))
    qstate = None
    if any(p[1] == "int8:static" for p in fwd_probes):
        amax = dm.collect_int8_amax(params, spec, [np.asarray(x)])
        qstate = dm.make_qstate(params, spec, amax)
    for label, cd, mode, ps in fwd_probes:
        qs = qstate if cd == "int8:static" else None
        if cd == "int8:static":
            cd = "int8"
        if mode is None:
            def run(p, xx, vh, vw, cd=cd, ps=ps, qs=qs):
                return dm.forward(p, xx, spec, compute_dtype=cd,
                                  pallas_stem=ps, qstate=qs)
        else:
            def run(p, xx, vh, vw, cd=cd, mode=mode, ps=ps, qs=qs):
                return dm.forward(p, xx, spec, compute_dtype=cd,
                                  valid_hw=(vh, vw), mask_mode=mode,
                                  pallas_stem=ps, qstate=qs)

        fn = jax.jit(run)
        wall = _timed(fn, (params, x, vh_t, vw_t), args.iters)
        results[label] = {
            "ms": round(wall * 1e3, 2),
            "tflops_s": round(flops / wall / 1e12, 1),
        }
        print(json.dumps({"probe": label, "size": [h, w], **results[label]}),
              flush=True)

    if not args.train_only and args.only is None:
        # batching: B copies of the same forward in one dispatch
        xb = jnp.asarray(rng.randn(args.batch, h // 2, w // 2, 3)
                         .astype(np.float32) * 30)
        x1 = xb[:1]
        f_b = jax.jit(lambda p, xx: dm.forward(p, xx, spec))
        w1 = _timed(f_b, (params, x1), args.iters)
        wb = _timed(f_b, (params, xb), args.iters)
        print(json.dumps({
            "probe": "batching", "size": [h // 2, w // 2],
            "batch": args.batch,
            "ms_b1": round(w1 * 1e3, 2), "ms_bN": round(wb * 1e3, 2),
            "speedup_per_image": round(args.batch * w1 / wb, 2),
        }), flush=True)

    if args.train:
        # "production" = whatever mask_plan(train=True) picks for the
        # configured mode ("where" today); "band_margin_forced" overrides
        # the train mapping to re-measure why band is NOT used in training
        # (the evidence behind mask_plan's train=True branch).
        for mode in ("production", "production_pallas",
                     "band_margin_forced"):
            for th, tw, iter_size in ((768, 1024, 1), (512, 640, 2)):
                ms = _train_step_ms(th, tw, iter_size, mode, args.iters)
                # reference context: 4 GPUs x iter_size 2 x batch 1 = 8
                # images per schedule step; per-device img/s here is
                # iter_size / step-wall (one image per micro-batch)
                print(json.dumps({
                    "probe": f"train_step_{mode}", "size": [th, tw],
                    "iter_size": iter_size, "ms": round(ms * 1e3, 2),
                    "img_per_s_per_chip": round(iter_size / ms, 3),
                }), flush=True)


def _train_step_ms(th, tw, iter_size, mode, iters):
    """Median wall of the production train step (uint8 upload included) on
    a synthetic image at the given ORIGINAL size, scale 1.0, no crop —
    the `caffe time`-equivalent for training (VERDICT r1 weak #4).

    mode "production" times the step as the train loop builds it;
    "production_pallas" additionally enables TPU.PALLAS_STEM_TRAIN (the
    fused stem forward+backward kernel — the measured evidence for that
    flag); "band_margin_forced" monkeypatches detector.mask_plan so
    training runs the inference-style band_margin path (margin buckets +
    zero-slab updates) — the configuration mask_plan(train=True)
    deliberately avoids; this probe is the reproducible evidence for that
    choice."""
    import time

    import jax
    import jax.numpy as jnp
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.parallel.mesh import make_mesh
    from smallhardface_tpu.train import train_loop, targets, solver

    saved_plan = dm.mask_plan
    saved_pst = bool(cfg.TPU.PALLAS_STEM_TRAIN)
    if mode == "band_margin_forced":
        dm.mask_plan = lambda cfg_mode, train=False: ("band_margin", 32)
    cfg.TPU.PALLAS_STEM_TRAIN = (mode == "production_pallas")
    try:
        spec = dm.build_spec(cfg)
        params = dm.init_params(jax.random.PRNGKey(3), spec)
        tc = targets.from_cfg(cfg)
        mesh = make_mesh(1)
        step = train_loop.make_train_step(
            spec, tc, mesh, iter_size, weight_decay=0.0005)
        rng = np.random.RandomState(0)
        samples = [{
            "height": th, "width": tw,
            "data": rng.randint(0, 255, (th, tw, 3), dtype=np.uint8),
            "im_scale": 1.0, "crop": np.zeros(2, np.float32),
            "gt_boxes": np.array(
                [[100., 100., 200., 200., 1.], [300., 300., 420., 420., 1.]],
                np.float32),
            "im_idx": 0,
        } for _ in range(iter_size)]
        batch, _, bucket = train_loop.assemble_batch(
            samples, 1, iter_size, list(cfg.TPU.MAX_GT_BUCKETS))
        opt_state = solver.init_state(params, "SGD")

        def one(params, opt_state, it):
            return step(
                params, opt_state, jnp.float32(0.004), jnp.int32(it),
                (bucket[2], bucket[3]),
                jnp.asarray(batch["data"]), jnp.asarray(batch["scale"]),
                jnp.asarray(batch["crop"]), jnp.asarray(batch["gt"]),
                jnp.asarray(batch["gt_mask"]), jnp.asarray(batch["im_hw"]),
                jnp.asarray(batch["valid_hw"]))

        params, opt_state, metrics = one(params, opt_state, 0)
        np.asarray(metrics["cls_loss"]).ravel()[:1]
        walls = []
        for i in range(iters):
            t0 = time.time()
            params, opt_state, metrics = one(params, opt_state, i + 1)
            np.asarray(metrics["cls_loss"]).ravel()[:1]
            walls.append(time.time() - t0)
        return float(np.median(walls))
    finally:
        dm.mask_plan = saved_plan
        cfg.TPU.PALLAS_STEM_TRAIN = saved_pst


if __name__ == "__main__":
    main()
