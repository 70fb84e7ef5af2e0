#!/usr/bin/env python3
"""Train-step time bisection — the TRAINING analog of
`layer_time --bisect` (VERDICT r3 item 1; the reference timed training
per-layer around its Step loop, /root/reference/caffe/tools/caffe.cpp:
339-427 + caffe/src/caffe/solver.cpp:180-268).

Decomposes the production train step into measured walls on the attached
chip, with DEVICE-RESIDENT inputs so host/tunnel costs are separated
from compute (the 127.9 ms "step" number in PERF_NOTES r3 silently
included a ~2.4 MB uint8 upload through the ~30 MB/s tunnel):

  upload        H2D of the uint8 original batch (what the loop pays
                per iteration unless it is overlapped with compute)
  preproc       fused device resize+crop+mean (train_loop.preprocess_image)
  forward       detector forward under the production train config
                (where-mask, Pallas stem if PALLAS_STEM_TRAIN)
  targets       anchor targets + OHEM top-k + losses
  backward      value_and_grad over the full loss (scan over iter_size,
                psum) minus the forward-value wall
  update        full production step (make_train_step) minus the grad wall
  metrics D2H   reading back the full per-step metrics dict (what the
                loop pays synchronously every iteration today)

Every stage runs under the SAME regime as production: shard_map over a
1-device mesh (so the stem VJP's varying types and the psum placement
match make_train_step exactly), iter_size micro-batches as a lax.scan.
Cumulative walls are solid; per-stage deltas carry the usual ±2-3 ms
per-prefix fusion noise. Walls are taken around a 1-element readback
(block_until_ready does not block through the tunnel — CLAUDE.md).

Usage: python -m smallhardface_tpu.tools.train_time [--size 768 1024]
       [--iter-size 1] [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[768, 1024])
    ap.add_argument("--iter-size", type=int, default=1)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    import os
    from smallhardface_tpu.config import cfg, cfg_from_file
    conf = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "smallhardface.toml")
    cfg_from_file(conf)

    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.parallel.mesh import make_mesh, DATA_AXIS
    from smallhardface_tpu.train import train_loop, targets, solver
    from smallhardface_tpu.tools import measure

    th, tw = args.size
    iter_size = args.iter_size
    spec = dm.build_spec(cfg)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    tc = targets.from_cfg(cfg)
    mesh = make_mesh(1)

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
    out_shape = (bucket[2], bucket[3])

    rtt = measure.rtt_baseline(args.reps)
    print(f"# RTT baseline (null dispatch + 1-elem readback): "
          f"{rtt*1e3:.1f} ms", flush=True)

    # ---- upload wall: H2D of the uint8 batch, completion forced by a
    # jitted scalar reduce (reading the whole array on device)
    touch = jax.jit(lambda d: d.astype(jnp.uint32).sum())
    np.asarray(touch(jnp.asarray(batch["data"])))     # compile + warm
    ups = []
    for _ in range(args.reps):
        t0 = time.time()
        dd = jnp.asarray(batch["data"])
        np.asarray(touch(dd)).ravel()[:1]
        ups.append(time.time() - t0)
    up = float(np.median(ups))
    nbytes = batch["data"].nbytes
    print(f"  upload {nbytes/1e6:.2f} MB uint8: {up*1e3:6.1f} ms "
          f"(− RTT ≈ {(up-rtt)*1e3:.1f} ms, "
          f"{nbytes/max(up-rtt,1e-9)/1e6:.0f} MB/s)", flush=True)

    dev_batch = {k: jax.device_put(jnp.asarray(v))
                 for k, v in batch.items()}
    dargs = (dev_batch["data"], dev_batch["scale"], dev_batch["crop"],
             dev_batch["gt"], dev_batch["gt_mask"], dev_batch["im_hw"],
             dev_batch["valid_hw"])
    in_specs = (P(),) + (P(DATA_AXIS),) * 7

    def unshard(arrs):
        return tuple(a[0] for a in arrs)

    def make_value_stage(stop_at):
        lf = train_loop._make_loss_fn(spec, tc, None, DATA_AXIS,
                                      stop_at=stop_at)

        def device_fn(params, *arrs):
            xs = unshard(arrs)

            def micro(acc, x):
                v, _ = lf(params, out_shape, *x)
                return acc + v.astype(jnp.float32), None

            tot, _ = lax.scan(micro, jnp.float32(0), xs)
            return tot[None]

        return jax.jit(shard_map(
            device_fn, mesh=mesh, in_specs=in_specs,
            out_specs=P(DATA_AXIS), check_vma=False))

    def make_grad_stage():
        lf = train_loop._make_loss_fn(spec, tc, None, DATA_AXIS)
        grad_fn = jax.value_and_grad(lf, has_aux=True)

        def device_fn(params, *arrs):
            xs = unshard(arrs)

            def micro(gsum, x):
                (_, aux), g = grad_fn(params, out_shape, *x)
                return jax.tree_util.tree_map(jnp.add, gsum, g), aux

            g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
            gsum, _ = lax.scan(micro, g0, xs)
            # check_vma=False keeps the transposed grads honest per-device
            # partials so this psum is the one exact reduction (see
            # make_train_step)
            return lax.psum(gsum, DATA_AXIS)

        return jax.jit(shard_map(
            device_fn, mesh=mesh, in_specs=in_specs, out_specs=P(),
            check_vma=False))

    fwd_flops = dm.forward_flops(spec, out_shape[0], out_shape[1])
    stages = [
        ("preproc", make_value_stage("preproc")),
        ("forward", make_value_stage("forward")),
        ("targets+loss", make_value_stage(None)),
        ("backward", make_grad_stage()),
    ]
    print(f"# device-resident stage walls @ bucket {out_shape} "
          f"iter_size={iter_size} (cumulative; Δ = this stage)",
          flush=True)
    prev = rtt
    walls = {}
    for name, fn in stages:
        t = measure.wall(fn, (params,) + dargs, args.reps)
        walls[name] = t
        print(f"  {name:14s} cum {t*1e3:7.1f} ms   Δ {(t-prev)*1e3:6.1f} ms",
              flush=True)
        prev = t

    # ---- full production step (donated params/opt → fresh copies,
    # rebind each call exactly like the train loop)
    step = train_loop.make_train_step(
        spec, tc, mesh, iter_size,
        weight_decay=float(cfg.TRAIN.WEIGHT_DECAY),
        momentum=float(cfg.TRAIN.MOMENTUM))
    p = jax.device_put(params)
    s = jax.device_put(solver.init_state(params, "SGD"))

    def run_step(p, s, i):
        return step(p, s, np.float32(0.004), np.int32(i), out_shape, *dargs)

    p, s, m = run_step(p, s, 0)
    np.asarray(m["cls_loss"]).ravel()[:1]
    ts = []
    for i in range(args.reps):
        t0 = time.time()
        p, s, m = run_step(p, s, i + 1)
        np.asarray(m["cls_loss"]).ravel()[:1]
        ts.append(time.time() - t0)
    t_step = float(np.median(ts))
    print(f"  {'FULL step':14s} cum {t_step*1e3:7.1f} ms   "
          f"Δ {(t_step-walls['backward'])*1e3:6.1f} ms (solver update)",
          flush=True)

    # ---- compile-time HBM for this bucket's program (the hbm_probe.py
    # convention: temp + args + out; donation aliases params/opt in the
    # live loop so the loop's true peak is lower by the aliased bytes)
    hbm = {}
    try:
        mem = step.lower(p, s, np.float32(0.004), np.int32(0), out_shape,
                         *dargs).compile().memory_analysis()
        hbm = {
            "hbm_temp_mb": round(mem.temp_size_in_bytes / 1e6, 1),
            "hbm_args_mb": round(mem.argument_size_in_bytes / 1e6, 1),
            "hbm_out_mb": round(mem.output_size_in_bytes / 1e6, 1),
            "hbm_peak_mb": round(
                (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                 + mem.output_size_in_bytes) / 1e6, 1),
        }
        print(f"  HBM @ bucket {out_shape}: temp {hbm['hbm_temp_mb']} MB, "
              f"args {hbm['hbm_args_mb']} MB, out {hbm['hbm_out_mb']} MB "
              f"-> peak {hbm['hbm_peak_mb']} MB", flush=True)
    except Exception as e:                          # CPU backends may not
        print(f"  HBM analysis unavailable: {e}", flush=True)

    # ---- metrics D2H: the loop's synchronous full-dict readback
    ms = []
    for i in range(args.reps):
        p, s, m = run_step(p, s, 100 + i)
        np.asarray(m["cls_loss"]).ravel()[:1]      # complete the step
        t0 = time.time()
        got = {k: np.asarray(v) for k, v in m.items()}
        ms.append(time.time() - t0)
    t_metrics = float(np.median(ms))
    print(f"  metrics D2H (full dict, post-completion): "
          f"{t_metrics*1e3:.1f} ms", flush=True)

    compute = max(t_step - rtt, 1e-9)
    step_flops = 3.0 * fwd_flops * iter_size   # fwd + ~2x fwd backward
    tfs = step_flops / compute / 1e12
    print(json.dumps({
        "probe": "train_bisect", "size": [th, tw],
        "bucket": list(out_shape), "iter_size": iter_size,
        "rtt_ms": round(rtt * 1e3, 1),
        "upload_ms": round((up - rtt) * 1e3, 1),
        "step_wall_ms": round(t_step * 1e3, 1),
        "step_compute_ms": round(compute * 1e3, 1),
        "metrics_readback_ms": round(t_metrics * 1e3, 1),
        "stage_cum_ms": {k: round(v * 1e3, 1) for k, v in walls.items()},
        "train_tflops_s": round(tfs, 1),
        "train_mfu_197": round(tfs / 197.0, 3),
        "img_per_s_compute": round(iter_size / compute, 2),
        **hbm,
    }), flush=True)


if __name__ == "__main__":
    main()
