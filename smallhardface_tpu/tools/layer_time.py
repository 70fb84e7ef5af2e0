#!/usr/bin/env python3
"""Per-layer timing digestion — the `caffe time` analog for the TPU build.

The reference printed per-layer average forward/backward milliseconds
(/root/reference/caffe/tools/caffe.cpp:339-427). Traces through the axon
tunnel carry unreliable timestamps, so instead this digests the COMPILED
program: the TPU backend annotates every entry-computation op with its
cost-model `estimated_cycles`, and detector.forward wraps each layer in
jax.named_scope, so cycles aggregate cleanly by layer. The table reports
each layer's share of the modeled compute plus its analytic conv FLOPs —
enough to see where the time goes and how efficiently each layer maps to
the MXU (the question VERDICT r1 raised about the stem).

Shares are compiler estimates, not measurements; `--bisect` MEASURES the
per-stage walls instead (truncated forwards, deltas differenced — the
caffe-time-style ground truth; needs the real chip). CALIBRATION, round 3
(scripts/stem_probe.py + --bisect): the cost model's absolute cycles run
~3× above the real wall and its 22 % conv1_1 share is an artifact —
measured, the C=3 stem costs ≈ 0 ms and the whole VGG-13 stack runs at
~106 TF/s (≈ 0.54 MFU of the 197 TF/s MXU peak); treat the model table
as relative shape hints, and the --bisect table as the measurement.

Usage: python -m smallhardface_tpu.tools.layer_time [--size 1408 1920]
       [--mask-mode band_margin|where|none] [--bisect [--reps 8]]
"""

from __future__ import annotations

import argparse
import collections
import re


def collect_cycles(hlo_text, jit_name="run"):
    """{(scope, phase): cycles} summed over entry-computation ops, keyed
    by the first named_scope component of the op metadata (else the op
    name). phase is "fwd" or, for `transpose(jvp(scope))` paths produced
    by autodiff, "bwd"."""
    per_scope = collections.Counter()
    # entry ops carry both metadata and a backend_config with
    # estimated_cycles; fusion-internal ops carry no backend_config
    pat = re.compile(
        r'metadata={op_name="jit\(' + re.escape(jit_name) +
        r'\)/([^"]+)".*?"estimated_cycles":"(\d+)"')
    for m in pat.finditer(hlo_text):
        path, cycles = m.group(1), int(m.group(2))
        scope = path.split("/")[0]
        phase = "fwd"
        bw = re.match(r"transpose\(jvp\(([^)]*)\)\)", scope)
        if bw:
            scope, phase = bw.group(1) or "(other)", "bwd"
        else:
            fw = re.match(r"jvp\(([^)]*)\)", scope)
            if fw:
                scope = fw.group(1) or "(other)"
        per_scope[(scope, phase)] += cycles
    return per_scope


def _bisect(spec, params, x, args, jax, jnp, dm):
    """Measured per-stage attribution: time jitted PREFIXES of the VGG
    stack (plus the complete forward) and difference the walls
    (tools/measure.py holds the tunnel-safe timing helpers)."""
    import math

    import numpy as np

    from smallhardface_tpu.tools import measure

    h, w = args.size
    params = jax.device_put(params)
    xd = jax.device_put(x)
    rtt = measure.rtt_baseline(args.reps)
    print(f"# null dispatch+readback (RTT baseline): {rtt*1e3:.1f} ms")

    stages = measure.vgg_stage_list(dm.VGG_STAGES)

    shapes = dm.param_shapes(spec)
    print(f"# truncated forwards @ {h}x{w} (Δ = this stage; cumulative "
          f"walls include the RTT)")
    prev, s = rtt, 1
    for k, nm in enumerate(stages, 1):
        t = measure.wall(measure.make_prefix_fn(stages, k), (params, xd),
                         args.reps)
        d = t - prev
        gf = 0.0
        if not nm.startswith("pool"):
            kh, kw, ci, co = shapes[nm]["w"]
            gf = 2e-9 * math.ceil(h / s) * math.ceil(w / s) * kh * kw * ci * co
        print(f"  {nm:10s} cum {t*1e3:7.1f} ms   Δ {d*1e3:6.1f} ms   "
              f"{gf:7.1f} GF")
        prev = t
        if nm.startswith("pool"):
            s *= 2
    full = jax.jit(lambda p, xx: jax.tree_util.tree_map(
        jnp.sum, dm.forward(p, xx, spec)))
    t = measure.wall(full, (params, xd), args.reps)
    tf = dm.forward_flops(spec, h, w) / max(t - rtt, 1e-9) / 1e12
    print(f"  {'FULL fwd':10s} cum {t*1e3:7.1f} ms   "
          f"(compute ~{(t-rtt)*1e3:.1f} ms, {tf:.1f} TF/s, "
          f"MFU {tf/197:.2f} vs the 197 TF/s MXU peak)")


def _bisect_int8(spec, params, args, jax, jnp, dm):
    """Per-stage int8-vs-fp32 walls of the POST-STEM VGG chain (the
    serving int8 chain's exact domain — conv2_1..conv5_3 with chained
    int8 carriers, detector.forward's calibrated static mode) next to
    each stage's roofline floor: max(FLOPs at the 394 TOPS int8 MXU peak,
    bytes at the MEASURED HBM bandwidth). The VERDICT-r3 'make int8 win
    or retire it with data' evidence: where measured ≈ floor the stage is
    bandwidth-bound and no quantization can buy it back."""
    import math

    import numpy as np

    from smallhardface_tpu.tools import measure

    h, w = args.size
    B = int(args.batch)
    params = jax.device_put(params)
    rtt = measure.rtt_baseline(args.reps)
    print(f"# null dispatch+readback (RTT baseline): {rtt*1e3:.1f} ms")
    bw, bw_wall = measure.hbm_bandwidth()
    print(f"# measured HBM r+w bandwidth: {bw/1e9:.0f} GB/s "
          f"(16-deep looped 2 GiB passes, wall {bw_wall*1e3:.1f} ms; "
          f"v5e spec 819)")

    # timing-only qstate: calibration values don't change the program
    amax = {n: 1.0 for n in dm.int8_layer_names(spec)}
    qstate = jax.device_put(dm.make_qstate(params, spec, amax))

    stages = measure.chain_stage_list(dm.VGG_STAGES)
    hs, ws = h // 2, w // 2                  # pool1 output grid
    q8 = jax.device_put(jnp.zeros((B, hs, ws, 64), jnp.int8))
    qf = jax.device_put(jnp.zeros((B, hs, ws, 64), jnp.float32))

    shapes = dm.param_shapes(spec)
    print(f"# post-stem chain @ {h}x{w} input (B={B} {hs}x{ws}x64 "
          f"carrier); per-stage Δs carry ±RTT noise — trust the "
          f"round-robin totals; floors: FLOPs@394T vs bytes@meas")
    prev8, prevf, s = rtt, rtt, 2
    chans = 64
    floor_sum = 0.0
    for k, nm in enumerate(stages, 1):
        t8 = measure.wall(
            measure.make_chain_fn(stages, k, int8=True, qstate=qstate),
            (params, q8), args.reps)
        tf = measure.wall(
            measure.make_chain_fn(stages, k), (params, qf), args.reps)
        d8, df = t8 - prev8, tf - prevf
        prev8, prevf = t8, tf
        hh, ww = math.ceil(h / s), math.ceil(w / s)
        if nm.startswith("pool"):
            io8 = B * hh * ww * chans * 1.25     # read + 1/4-size write
            floor_sum += io8 / bw
            print(f"  {nm:10s} int8 Δ {d8*1e3:6.1f} ms   fp32 Δ "
                  f"{df*1e3:6.1f} ms   floor {io8/bw*1e3:5.2f} ms (io)")
            s *= 2
            continue
        kh, kw, ci, co = shapes[nm]["w"]
        fl = 2.0 * B * hh * ww * kh * kw * ci * co
        by8 = B * hh * ww * (ci + co) + kh * kw * ci * co
        t_fl, t_by = fl / 394e12, by8 / bw
        bound = "BW" if t_by > t_fl else "MXU"
        floor_sum += max(t_fl, t_by)
        print(f"  {nm:10s} int8 Δ {d8*1e3:6.1f} ms   fp32 Δ "
              f"{df*1e3:6.1f} ms   floor {max(t_fl, t_by)*1e3:5.2f} ms "
              f"({bound}: {t_fl*1e3:.2f} flops / {t_by*1e3:.2f} bytes)")
        chans = co

    # ---- the trustworthy totals: full chain, round-robin vs a null
    # dispatch so tunnel weather cancels in the difference
    k = len(stages)
    walls = measure.wall_roundrobin([
        ("null", jax.jit(lambda v: v + 1.0),
         (jnp.zeros((8,), jnp.float32),)),
        ("fp32", measure.make_chain_fn(stages, k), (params, qf)),
        ("int8", measure.make_chain_fn(stages, k, int8=True,
                                       qstate=qstate), (params, q8)),
    ], reps=args.reps)
    c8 = walls["int8"] - walls["null"]
    cf = walls["fp32"] - walls["null"]
    n_conv = sum(1 for nm in stages if not nm.startswith("pool"))
    # derive per-conv strides from the stage walk itself (pool doubles),
    # so a changed backbone (e.g. skeletal test stages) stays correct
    conv_strides = []
    ss = 2
    for nm in stages:
        if nm.startswith("pool"):
            ss *= 2
        else:
            conv_strides.append(ss)
    flops = sum(2.0 * B * math.ceil(h / ss) * math.ceil(w / ss)
                * np.prod(shapes[nm]["w"])
                for nm, ss in zip(
                    [n for n in stages if not n.startswith("pool")],
                    conv_strides))
    print(f"  CHAIN (round-robin, {n_conv} convs, B={B}): "
          f"int8 {c8*1e3:7.1f} ms ({flops/max(c8,1e-9)/1e12:.0f} TF/s)   "
          f"fp32 {cf*1e3:7.1f} ms ({flops/max(cf,1e-9)/1e12:.0f} TF/s)   "
          f"roofline floor {floor_sum*1e3:.1f} ms   int8:fp32 "
          f"{cf/max(c8,1e-9):.2f}x — stem/fusion/heads excluded")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1408, 1920])
    ap.add_argument("--mask-mode", default="band_margin",
                    choices=["band_margin", "band", "where", "none"])
    ap.add_argument("--train", action="store_true",
                    help="profile forward+backward (grad of a sum loss "
                         "under the training mask mode) — per-layer "
                         "fwd/bwd like `caffe time`")
    ap.add_argument("--bisect", action="store_true",
                    help="MEASURE per-stage walls via truncated forwards "
                         "(ground truth; ±2-3 ms per-delta noise from "
                         "per-prefix fusion choices — read the cumulative "
                         "column). Requires a real device.")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1,
                    help="with --int8-chain: carrier batch size — B=4 "
                         "amplifies compute ~4x over the ~30 ms tunnel "
                         "RTT so the chain totals are trustworthy")
    ap.add_argument("--int8-chain", action="store_true",
                    help="with --bisect: per-stage int8-vs-fp32 walls of "
                         "the post-stem chain next to roofline floors "
                         "(measured HBM bandwidth) — the int8 "
                         "win-or-retire evidence")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smallhardface_tpu.models import detector as dm

    h, w = args.size
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    x = jnp.zeros((1, h, w, 3), jnp.float32)

    if args.bisect:
        if args.int8_chain:
            _bisect_int8(spec, params, args, jax, jnp, dm)
        else:
            _bisect(spec, params, x, args, jax, jnp, dm)
        return

    if args.train:
        def loss(p, xx, vh, vw):
            out = dm.forward(p, xx, spec, valid_hw=(vh, vw),
                             mask_mode="where")
            return (out["cls_logits"].sum() + out["bbox_deltas"].sum())

        def run(p, xx, vh, vw):
            return jax.grad(loss)(p, xx, vh, vw)
    elif args.mask_mode == "none":
        def run(p, xx, vh, vw):
            return dm.forward(p, xx, spec)
    else:
        def run(p, xx, vh, vw, mode=args.mask_mode):
            return dm.forward(p, xx, spec, valid_hw=(vh, vw),
                              mask_mode=mode)

    compiled = jax.jit(run).lower(
        params, x, jnp.int32(h - 32), jnp.int32(w - 32)).compile()
    per_scope = collect_cycles(compiled.as_text())
    total = sum(per_scope.values())
    if not total:
        print(f"# no estimated_cycles in the compiled HLO — the "
              f"{jax.default_backend()} backend does not annotate costs; "
              f"run on a TPU backend")
        return

    shapes = dm.param_shapes(spec)
    import math

    def layer_flops(name, s):
        if name not in shapes or "w" not in shapes[name]:
            return None
        kh, kw, ci, co = (list(shapes[name]["w"]) + [1])[:4]
        hs, ws = math.ceil(h / s), math.ceil(w / s)
        return 2.0 * hs * ws * kh * kw * ci * co

    stride_of = {}
    s = 1
    for stage, _, n in dm.VGG_STAGES:
        for i in range(1, n + 1):
            stride_of[f"{stage}_{i}"] = s
        s *= 2
    s_top = s // 2
    stride_of["conv5_256"] = s_top
    # the transposed conv WRITES the stride-8 (2H x 2W) grid
    stride_of["conv5_256_up"] = s_top // 2
    for nm in ("conv4_256", "conv4_fuse_final", "conv4_fuse_final_dim_red"):
        stride_of[nm] = s_top // 2
    head_flops = None
    if spec.different_dilation:
        hf = layer_flops("head", s_top // 2) or 0.0
        for k in dm.ANCHOR_SCALES:
            hf += (layer_flops(f"cls_score_{k}", s_top // 2) or 0.0) / 3
            hf += (layer_flops(f"bbox_pred_{k}", s_top // 2) or 0.0) / 3
        head_flops = hf

    def scope_flops(scope):
        if scope.startswith("head_"):
            return head_flops
        if scope in stride_of:
            return layer_flops(scope, stride_of[scope])
        return None

    by_layer = collections.defaultdict(lambda: {"fwd": 0, "bwd": 0})
    for (scope, phase), cyc in per_scope.items():
        by_layer[scope][phase] += cyc

    # pin the efficiency baseline to conv1_1 (or conv1_1_s2d) so tables
    # from different sizes/modes stay comparable
    base = "conv1_1_s2d" if "conv1_1_s2d" in by_layer else "conv1_1"
    base_gf = layer_flops("conv1_1", 1)
    base_cyc = by_layer.get(base, {}).get("fwd", 0)
    base_eff = (base_gf / base_cyc) if base_cyc else None
    mode = "train fwd+bwd" if args.train else f"mask_mode={args.mask_mode}"
    print(f"# per-layer compiled-cost shares @ {h}x{w}, {mode} "
          f"(cycles are the TPU cost model's; rel eff is fwd GFLOP/cycle "
          f"vs {base})")
    print(f"{'layer':28s} {'fwd cyc':>12s} {'bwd cyc':>12s} {'share':>7s} "
          f"{'GFLOP':>8s} {'rel eff':>8s}")
    order = sorted(by_layer.items(),
                   key=lambda kv: -(kv[1]["fwd"] + kv[1]["bwd"]))
    for scope, cyc in order:
        gf = scope_flops(scope)
        eff = (gf / cyc["fwd"]) if (gf and cyc["fwd"]) else None
        print(f"{scope:28s} {cyc['fwd']:12d} {cyc['bwd']:12d} "
              f"{(cyc['fwd'] + cyc['bwd'])/total:6.1%} "
              f"{(gf or 0)/1e9:8.1f} "
              f"{(eff/base_eff if (eff and base_eff) else 0):8.2f}")
    print(f"{'TOTAL':28s} {total:12d}")


if __name__ == "__main__":
    main()
