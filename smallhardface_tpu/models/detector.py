"""The smallhardface detector: VGG-16 backbone + FPN-lite fusion + detection
heads, as a pure-functional JAX model (NHWC).

Graph parity with the reference prototxt templates
(/root/reference/models/test_different_dilation_template.prototxt,
 test_template.prototxt) after the programmatic surgery applied by
/root/reference/lib/prototxt/manipulate.py:154-188 (dim-reduction insert and
backbone/head lr multipliers).

The "model-graph generation" layer of the reference (prototxt templates +
protobuf surgery, SURVEY.md L5) becomes `ModelSpec`/`build_spec`: a small
declarative description from which the forward pass, the parameter shapes,
and the per-parameter lr/decay multipliers are generated.

The three dilated heads share one weight/bias pair *structurally*: the same
param leaf is used for all three convs (the reference used Caffe named-param
sharing, net.cpp:421).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from smallhardface_tpu.models.layers import (
    conv2d, conv2d_int8, conv2d_int8_chain, conv_s2d_3x3, max_pool_2x2,
    bilinear_kernel, upsample2x_bilinear)

# (name, out_channels, n_convs) per VGG stage; conv1/conv2 are frozen
# (lr_mult 0 in the templates, models/test_template.prototxt:22-29).
VGG_STAGES = (
    ("conv1", 64, 2),
    ("conv2", 128, 2),
    ("conv3", 256, 3),
    ("conv4", 512, 3),
    ("conv5", 512, 3),
)

ANCHOR_SCALES = (1, 2, 4)
HEAD_DILATIONS = (1, 2, 4)
FEAT_STRIDE = 8


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Declarative detector description (the prototxt-template analog)."""
    different_dilation: bool = True
    head_channels: int = 128
    lateral_channels: int = 256
    fuse_channels: int = 512
    dim_red_channels: int = 128
    num_classes: int = 2
    num_anchors: int = len(ANCHOR_SCALES)
    backbone_lr_mult: float = 2.0
    head_lr_mult: float = 1.0


def build_spec(cfg) -> ModelSpec:
    """Build the spec from the global config, mirroring manipulate_train/test
    template selection (/root/reference/lib/prototxt/manipulate.py:35-86)."""
    return ModelSpec(
        different_dilation=bool(cfg.MODEL.DIFFERENT_DILATION.ENABLE),
        backbone_lr_mult=float(cfg.TRAIN.LR.BACKBONE_MULT),
        head_lr_mult=float(cfg.TRAIN.LR.HEAD_MULT),
    )


def _conv_names(spec: ModelSpec):
    names = []
    for stage, _, n in VGG_STAGES:
        for i in range(1, n + 1):
            names.append(f"{stage}_{i}")
    names += ["conv5_256", "conv4_256", "conv4_fuse_final"]
    if spec.different_dilation:
        names += ["conv4_fuse_final_dim_red", "head"]
        for k in ANCHOR_SCALES:
            names += [f"cls_score_{k}", f"bbox_pred_{k}"]
    else:
        names += ["head", "cls_score", "bbox_pred"]
    return names


def param_shapes(spec: ModelSpec):
    """Shape tree {name: {'w': HWIO, 'b': (O,)}} for every learnable conv,
    plus the fixed bilinear deconv kernel under 'conv5_256_up'."""
    shapes = {}
    in_c = 3
    for stage, out_c, n in VGG_STAGES:
        for i in range(1, n + 1):
            shapes[f"{stage}_{i}"] = {"w": (3, 3, in_c, out_c), "b": (out_c,)}
            in_c = out_c
    lat = spec.lateral_channels
    stage_out = {stage: out_c for stage, out_c, _ in VGG_STAGES}
    shapes["conv5_256"] = {"w": (1, 1, stage_out["conv5"], lat),
                           "b": (lat,)}
    shapes["conv4_256"] = {"w": (1, 1, stage_out["conv4"], lat),
                           "b": (lat,)}
    shapes["conv5_256_up"] = {"w": (4, 4, 1, lat)}
    shapes["conv4_fuse_final"] = {
        "w": (3, 3, 2 * lat, spec.fuse_channels), "b": (spec.fuse_channels,)}
    head_in = spec.fuse_channels
    if spec.different_dilation:
        shapes["conv4_fuse_final_dim_red"] = {
            "w": (3, 3, spec.fuse_channels, spec.dim_red_channels),
            "b": (spec.dim_red_channels,)}
        head_in = spec.dim_red_channels
        shapes["head"] = {
            "w": (3, 3, head_in, spec.head_channels),
            "b": (spec.head_channels,)}
        for k in ANCHOR_SCALES:
            shapes[f"cls_score_{k}"] = {
                "w": (1, 1, spec.head_channels, spec.num_classes),
                "b": (spec.num_classes,)}
            shapes[f"bbox_pred_{k}"] = {
                "w": (1, 1, spec.head_channels, 4), "b": (4,)}
    else:
        shapes["head"] = {
            "w": (3, 3, head_in, spec.head_channels),
            "b": (spec.head_channels,)}
        shapes["cls_score"] = {
            "w": (1, 1, spec.head_channels,
                  spec.num_anchors * spec.num_classes),
            "b": (spec.num_anchors * spec.num_classes,)}
        shapes["bbox_pred"] = {
            "w": (1, 1, spec.head_channels, spec.num_anchors * 4),
            "b": (spec.num_anchors * 4,)}
    return shapes


def init_params(rng, spec: ModelSpec, dtype=jnp.float32):
    """Initial weights.

    Layers that carry a filler in the templates keep it: gaussian(0, 0.01)
    weights / zero biases for laterals, fuse, and heads
    (models/train_different_dilation_template.prototxt:383-642), fixed
    bilinear for the deconv. The VGG backbone convs have NO filler in the
    templates (Caffe default = constant 0 — the reference can only train
    from ImageNet weights, which overwrite them); here they get He/MSRA
    init so from-scratch training is well-posed. Pretrained loading via
    io.caffemodel overwrites the backbone either way."""
    shapes = param_shapes(spec)
    backbone = {f"{stage}_{i}" for stage, _, n in VGG_STAGES
                for i in range(1, n + 1)}
    params = {}
    keys = jax.random.split(rng, len(shapes))
    for key, (name, tree) in zip(keys, sorted(shapes.items())):
        leaf = {}
        if name == "conv5_256_up":
            leaf["w"] = jnp.asarray(
                bilinear_kernel(2, spec.lateral_channels), dtype)
        elif name in backbone:
            kh, kw, ci, _ = tree["w"]
            std = float(np.sqrt(2.0 / (kh * kw * ci)))
            leaf["w"] = std * jax.random.normal(key, tree["w"], dtype)
            leaf["b"] = jnp.zeros(tree["b"], dtype)
        else:
            leaf["w"] = 0.01 * jax.random.normal(key, tree["w"], dtype)
            leaf["b"] = jnp.zeros(tree["b"], dtype)
        params[name] = leaf
    return params


def param_multipliers(spec: ModelSpec):
    """Per-leaf (lr_mult, decay_mult) trees reproducing the template
    ParamSpecs after `_apply_mult_lr` (manipulate.py:154-163):

    - conv1/conv2: frozen (0, 0)
    - conv3..conv5: w (1,1), b (2,1)   [decay_mult defaults to 1 in Caffe]
    - laterals + fuse: w (1,1), b (2,1); dim_red: w (1,1), b (2,1)
    - deconv: (0, 0)
    - head: w (1,1), b (2,0); cls/bbox: w (1,1), b (2,0)
    - then lr_mult ×BACKBONE_MULT for everything before the heads,
      ×HEAD_MULT for head/cls/bbox.
    """
    shapes = param_shapes(spec)
    lr, decay = {}, {}
    head_names = {"head", "cls_score", "bbox_pred"} | {
        f"cls_score_{k}" for k in ANCHOR_SCALES} | {
        f"bbox_pred_{k}" for k in ANCHOR_SCALES}
    for name, tree in shapes.items():
        is_head = name in head_names
        mult = spec.head_lr_mult if is_head else spec.backbone_lr_mult
        if name.startswith(("conv1_", "conv2_")) or name == "conv5_256_up":
            lr[name] = {k: 0.0 for k in tree}
            decay[name] = {k: 0.0 for k in tree}
            continue
        w_lr, b_lr = 1.0 * mult, 2.0 * mult
        b_decay = 0.0 if is_head else 1.0
        lr[name] = {"w": w_lr, "b": b_lr}
        decay[name] = {"w": 1.0, "b": b_decay}
    return lr, decay


def forward_flops(spec: ModelSpec, h, w, batch=1):
    """Analytic conv FLOPs (2×MACs, biases/activations ignored) of one
    forward pass at input size (h, w). Used for MFU reporting — the analog
    of `caffe time`'s per-layer accounting, folded to one number."""
    import math

    shapes = param_shapes(spec)

    def cf(name, hs, ws):
        kh, kw, ci, co = shapes[name]["w"]
        return 2.0 * hs * ws * kh * kw * ci * co

    total = 0.0
    s = 1
    for stage, _, n in VGG_STAGES:
        hs, ws = math.ceil(h / s), math.ceil(w / s)
        for i in range(1, n + 1):
            total += cf(f"{stage}_{i}", hs, ws)
        if stage != "conv5":
            s *= 2
    h16, w16 = math.ceil(h / 16), math.ceil(w / 16)
    h8, w8 = math.ceil(h / 8), math.ceil(w / 8)
    total += cf("conv5_256", h16, w16)
    kh, kw, _, co = shapes["conv5_256_up"]["w"]
    total += 2.0 * h8 * w8 * kh * kw * co          # grouped bilinear deconv
    total += cf("conv4_256", h8, w8)
    total += cf("conv4_fuse_final", h8, w8)
    if spec.different_dilation:
        total += cf("conv4_fuse_final_dim_red", h8, w8)
        for k in ANCHOR_SCALES:
            total += cf("head", h8, w8)
            total += cf(f"cls_score_{k}", h8, w8)
            total += cf(f"bbox_pred_{k}", h8, w8)
    else:
        total += cf("head", h8, w8)
        total += cf("cls_score", h8, w8)
        total += cf("bbox_pred", h8, w8)
    return batch * total


# bucket padding the band_margin contract guarantees beyond the valid
# extent (mask_plan); also caps how many convs one band clean can serve
# at a given stride (grouped cleaning below)
BAND_MARGIN_PX = 32


def mask_plan(cfg_mode: str, train: bool = False):
    """(forward mask_mode, bucket margin px) for a TPU.MASK_MODE value.

    Inference under "band" buckets with ≥32 px of padding beyond the valid
    extent, unlocking the zero-slab "band_margin" fast path (62 vs 68 ms
    at 1408×1920, PERF_NOTES.md). Training keeps "where" even when "band"
    is configured: the margin bumps the 128-px train buckets ~31 % of the
    pixels at the reference 768×1024 shape, and the dynamic-update-slice
    BACKWARD adds layout-copy passes — measured 266 ms vs 127 ms per step
    (perf_probe --train). Inside-valid values are identical either way."""
    if cfg_mode in ("band", "band_margin"):
        if train:
            return "where", 0
        return "band_margin", BAND_MARGIN_PX
    if cfg_mode == "exact":
        # exact-shape inference programs: detect.* compiles one program
        # per distinct ×16 pyramid geometry (no bucket padding at all),
        # so there is no padded region and every mask/band is a no-op —
        # the forward runs fully unmasked (14.2 vs 18.0 ms at 1408×1920,
        # PERF_NOTES round 3). Worth it only when image shapes repeat
        # (fixed-resolution serving); diverse shapes recompile per shape
        # (LRU-bounded). TRAINING keeps "where": train buckets are shared
        # across variable valid extents by design.
        if train:
            return "where", 0
        return "exact", 0
    if cfg_mode != "where":
        raise ValueError(
            "TPU.MASK_MODE must be 'band', 'where' or 'exact', "
            f"got {cfg_mode!r}")
    return cfg_mode, 0


def _zero_band(h, v, width, axis, margin_ok=False):
    """Zero positions [v, v+width) of spatial ``axis`` (1=H, 2=W).

    v is a traced scalar ≤ h.shape[axis]; positions < v are preserved even
    when the clamp makes the slice window overlap them (v near the end).

    margin_ok=True asserts the caller guarantees v + width <= size, so the
    update slab is a pure zeros constant: the dynamic-update-slice then has
    a single use of ``h`` and XLA performs it in place (no read-modify
    dynamic-slice, no full-buffer copy)."""
    size = h.shape[axis]
    width = min(int(width), size)
    starts = [jnp.int32(0)] * 4
    sizes = list(h.shape)
    sizes[axis] = width
    if margin_ok:
        # the caller promises v + width <= size (mask_plan's 32 px bucket
        # margin); a violated promise would make XLA clamp the start and
        # silently zero VALID activations — fail loudly when v is static
        if isinstance(v, (int, np.integer)) and v + width > size:
            raise ValueError(
                f"band margin violated: valid={v} + width={width} > "
                f"size={size} on axis {axis} (bucket lacks the margin "
                f"band_margin requires; see detector.mask_plan)")
        starts[axis] = jnp.asarray(v, jnp.int32)
        return jax.lax.dynamic_update_slice(
            h, jnp.zeros(tuple(sizes), h.dtype), tuple(starts))
    start = jnp.clip(jnp.asarray(v, jnp.int32), 0, size - width)
    starts[axis] = start
    slab = jax.lax.dynamic_slice(h, tuple(starts), tuple(sizes))
    shape = [1, 1, 1, 1]
    shape[axis] = width
    keep = ((start + jnp.arange(width)) < v).reshape(shape)
    slab = jnp.where(keep, slab, jnp.zeros((), h.dtype))
    return jax.lax.dynamic_update_slice(h, slab, tuple(starts))


def forward(params, x, spec: ModelSpec, compute_dtype=None, valid_hw=None,
            mask_mode="band", s2d_stem=False, pallas_stem=False,
            stem_vma=None, qstate=None, int8_amax=None,
            spatial_mesh=None, spatial_axis="sp"):
    """Run the detector. x: (B, H, W, 3) BGR mean-subtracted, H, W multiples
    of 16. Returns dict with:
      cls_logits: (B, h, w, A, 2)  per-anchor (bg, fg) logits, stride 8
      bbox_deltas: (B, h, w, A, 4)
    Anchor order along A matches ANCHOR_SCALES = (1, 2, 4), i.e. the row
    order of ops.anchors.generate_anchors(scales=[1,2,4]).

    compute_dtype: None (fp32), jnp.bfloat16, or the string "int8" —
    the quantized serving mode (layers.conv2d_int8; inference-only,
    requires mask_mode "exact"/"where", enforced below).

    qstate: optional static-quantization state from make_qstate()
    (calibrated per-layer activation amax + prebaked int8 weights) —
    only read in int8 mode; without it the activation scales are
    dynamic per-tensor max-reduces (correct but slower, PERF_NOTES).

    int8_amax: calibration hook — pass an empty dict and the fp32
    forward records the max|input| scalar of every int8-eligible conv
    into it (keys = layer names + "head"); reduce over calibration
    images with collect_int8_amax()/jnp.maximum, then make_qstate().

    valid_hw: optional (vh, vw) scalars — the ×16-padded image extent in
    input pixels when x carries extra bucket padding beyond it. The
    reference network only ever saw the ×16 extent, with implicit zero
    padding at every conv (net blobs end at H16/stride); without masking,
    conv biases make the bucket-padded region nonzero (relu(bias)) and
    those activations bleed back inside the valid extent through the
    receptive field.

    mask_mode selects how that implicit zero padding is reproduced:
      "band" (default): zero only the receptive-field band just outside
        the valid extent before each spatial conv (width = the conv's
        dilation; 1×1 convs and the 2×2 pools need none — valid extents
        are ×16 so they stay even at every pooled stride and pooling
        windows never straddle the boundary). Values INSIDE the valid
        extent are bit-identical to the "where" mode by construction —
        a conv output at an inside position only reads ≤ dilation
        positions past the boundary — while the garbage that accumulates
        deeper in the padding region is never read by anything (the
        decode/targets stages mask by valid grid extent).
      "band_margin": like "band" but the caller guarantees
        valid + width·stride ≤ bucket (≥32 input px of bucket padding,
        see detect._prep / train_loop.assemble_batch), so each band is a
        pure zeros dynamic-update-slice with no read-modify slice.
        Measured at 1408×1920 (PERF_NOTES.md): masking overhead drops
        from ~10 ms ("where": the shared 2-D mask pins fusion layouts
        and XLA inserts full-tensor layout-conversion copies around
        every conv, +8.9 GB HBM bytes) to ~4 ms (+7.2 GB worth of
        remaining dynamic-update-slice copies).
      "where": round-1 behavior — re-zero the whole padded region after
        every stage (kept as the belt-and-braces fallback; TPU.MASK_MODE).
      "exact": the caller guarantees x has NO bucket padding (its extent
        is the ×16 valid extent) — valid_hw is ignored and the forward
        runs fully unmasked; see mask_plan.
    Either way outputs beyond valid_hw//8 must be treated as garbage;
    consumers (ops.decode, train.targets) already mask by valid extent.

    s2d_stem computes conv1_1 in space-to-depth form (layers.conv_s2d_3x3)
    — an exact regrouping of the same dot products that lifts the MXU
    contraction from 27 to 108 lanes; the compiled cost model charges
    plain conv1_1 22 % of the whole forward (tools/layer_time.py).
    Requires the caller's input to be zero beyond valid_hw (all
    production callers zero it; the output returns to full-res layout
    before conv1_2's band, so the masking discipline is unchanged).
    (Measured moot in round 3 — conv1_1 costs ≈ 0 ms; superseded by
    pallas_stem.)

    pallas_stem runs conv1_1+relu+conv1_2+relu+pool1 as ONE fused Pallas
    kernel (ops/pallas_stem.py): intermediates never touch HBM, the
    valid-extent masking happens in-kernel, and the measured stem wall
    drops from ~12 ms to ~1.2 ms at 1408×1920 (PERF_NOTES round 3).
    Engages only when eligible (fp32 compute path, H % 8 == 0,
    W % 128 == 0, W ≤ 4096 — bucketed inference AND training shapes
    qualify; falls back to the plain stem otherwise). Numerics match the
    XLA stem to ~2e-5 relative (both run bf16 MXU passes; the kernel adds
    one bf16 rounding on the stored conv1_1 activation). Differentiable:
    the op carries a fused backward kernel emitting the four stem weight
    grads without materializing activations in HBM (TPU.PALLAS_STEM_TRAIN
    routes the train step here). stem_vma: varying-axis names when the
    forward runs inside shard_map (training DP).
    """
    cd = compute_dtype
    int8_mode = (cd == "int8")
    if int8_mode:
        # Quantized serving mode (TPU.PRECISION="int8"): the hot 3×3
        # convs (stages 2–5 + fusion + the shared dilated heads) run as
        # int8 MXU passes (layers.conv2d_int8 — the v5e MXU runs int8 at
        # 2× the bf16 rate). The stem keeps the fp32 Pallas kernel; 1×1
        # laterals and the score/bbox heads stay fp32 (cheap,
        # precision-sensitive). With a calibrated qstate the quantizes
        # are fused elementwise; without one the dynamic per-tensor
        # activation scale is a global max-reduce, so the bucket-padding
        # garbage "band" modes leave beyond the valid extent would
        # couple into inside-valid values — refuse band either way (the
        # static path also saturates against calibrated ranges that the
        # garbage would not respect).
        if mask_mode in ("band", "band_margin") and valid_hw is not None:
            raise ValueError(
                "int8 precision requires TPU.MASK_MODE 'exact' or "
                "'where': band masking leaves garbage beyond the valid "
                "extent and the dynamic activation scales are global "
                "reduces over it")
        cd = None                        # fp32 activation carrier
    if cd is not None:
        x = x.astype(cd)

    if mask_mode == "exact":
        # exact-shape contract (mask_plan): the tensor extent IS the ×16
        # valid extent — no bucket padding exists, so masks and bands are
        # numeric no-ops; drop them statically (the Pallas stem then runs
        # with full-extent valid too)
        valid_hw = None

    stride = [1]
    _mask_cache = {}
    use_band = mask_mode in ("band", "band_margin")
    margin_ok = (mask_mode == "band_margin")

    def mask(h):
        if valid_hw is None or use_band:
            return h
        s = stride[0]
        hh, ww = h.shape[1], h.shape[2]
        key = (s, hh, ww)
        if key not in _mask_cache:
            ys = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
            _mask_cache[key] = ((ys < valid_hw[0] // s) &
                                (xs < valid_hw[1] // s))[None, :, :, None]
        return jnp.where(_mask_cache[key], h, jnp.zeros((), h.dtype))

    def band(h, reach):
        """Clean the conv-input band [valid, valid+reach) at this stride."""
        if valid_hw is None or not use_band:
            return h
        s = stride[0]
        h = _zero_band(h, valid_hw[0] // s, reach, 1, margin_ok=margin_ok)
        return _zero_band(h, valid_hw[1] // s, reach, 2, margin_ok=margin_ok)

    # calibrated static mode: activations stay int8 BETWEEN convs (the
    # requantize onto the successor's grid fuses into each conv epilogue;
    # fp32 carriers were measured to forfeit the MXU win — PERF_NOTES).
    # _qsucc[name] = the conv whose calibrated input grid `name`'s output
    # is quantized onto; absent = the chain ends there (fp32 out).
    if int8_mode and qstate is not None:
        _qchain = [f"{stage}_{i}" for stage, _, n in VGG_STAGES
                   if stage != "conv1" for i in range(1, n + 1)]
        _qsucc = dict(zip(_qchain, _qchain[1:]))
        _qsucc["conv4_fuse_final"] = ("conv4_fuse_final_dim_red"
                                      if spec.different_dilation
                                      else "head")
        _qsucc["conv4_fuse_final_dim_red"] = "head"
    else:
        _qsucc = {}

    def _q_in(h, name):
        """int8 carrier on `name`'s calibrated input grid (pass-through
        if the chain already left it there; saturating clip if the fp32
        value exceeds the calibrated range)."""
        if h.dtype == jnp.int8:
            return h
        s = qstate["scales"][name] / 127.0
        return jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)

    def _q_conv(h, name, dilation, pad):
        """One quantized conv: chained static link when calibrated,
        dynamically-scaled fp32-carrier conv otherwise. Returns fp32
        post-ReLU unless a successor grid requantizes it."""
        if qstate is None:
            return jax.nn.relu(conv2d_int8(
                h, params[name]["w"], params[name]["b"],
                dilation=dilation, padding=pad))
        nxt = _qsucc.get(name)
        return conv2d_int8_chain(
            _q_in(h, name), qstate["qw"][name],
            qstate["scales"][name] / 127.0, qstate["s_w"][name],
            params[name]["b"], dilation=dilation, padding=pad,
            s_out=(None if nxt is None
                   else qstate["scales"][nxt] / 127.0))

    def _record_amax(name, h):
        """Calibration hook: fold max|h| into int8_amax[name]."""
        a = jnp.max(jnp.abs(h))
        int8_amax[name] = (jnp.maximum(int8_amax[name], a)
                           if name in int8_amax else a)

    def cbr(h, name, dilation=1):
        """Conv+bias+ReLU with the [valid, valid+dilation) input band
        cleaned first. The band is needed before EVERY spatial conv — the
        reference's implicit zero padding means an output at valid-1 must
        read exact ZEROS at the halo, and after any conv the halo holds
        relu(bias + boundary leakage) ≠ 0, so one wider band cannot serve
        a group of convs (tried in round 3; the bucket-padding parity
        test rejects it — see PERF_NOTES.md)."""
        pad = dilation  # 3x3 kernels throughout
        # named_scope → per-layer attribution in compiled-HLO metadata
        # (tools/layer_time.py, the `caffe time` analog); no numeric effect
        with jax.named_scope(name):
            hb = band(h, dilation)
            if int8_mode and not name.startswith("conv1"):
                return mask(_q_conv(hb, name, dilation, pad))
            if int8_amax is not None and not name.startswith("conv1"):
                _record_amax(name, hb)
            return mask(jax.nn.relu(conv2d(
                hb, params[name]["w"], params[name]["b"],
                dilation=dilation, padding=pad, compute_dtype=cd)))

    h = mask(x)
    feats = {}
    n_sp = (spatial_mesh.shape[spatial_axis]
            if spatial_mesh is not None else 1)
    use_pallas_stem = (
        pallas_stem and cd in (None, jnp.bfloat16)
        and VGG_STAGES[0] == ("conv1", 64, 2)       # skeletal test models
        and x.shape[1] % (8 * n_sp) == 0 and x.shape[2] % 128 == 0
        and x.shape[2] <= 4096
        # spatial: each shard pays a fixed 2·TH=16-row halo (strip
        # alignment), so tiny shards would mostly recompute neighbors'
        # rows — below 4 strips/shard the XLA chain is the better deal
        and (n_sp == 1 or x.shape[1] >= 4 * 8 * n_sp))
    if use_pallas_stem:
        # Mosaic only lowers on TPU — off-TPU the flag silently yields
        # the XLA chain (default.toml contract); tests opt back in via
        # pallas_stem.TESTING_INTERPRET
        from smallhardface_tpu.ops import pallas_stem as _ps
        use_pallas_stem = _ps.backend_ok()
    if use_pallas_stem:
        from smallhardface_tpu.ops.pallas_stem import (fused_stem,
                                                       fused_stem_spatial)
        with jax.named_scope("pallas_stem"):
            # the kernel is fp32-in/out (internally bf16 dots, like both
            # precision modes' MXU passes); under compute_dtype=bf16 the
            # activations upcast losslessly in and round back out
            stem_args = (
                h.astype(jnp.float32),
                params["conv1_1"]["w"].astype(jnp.float32),
                params["conv1_1"]["b"].astype(jnp.float32),
                params["conv1_2"]["w"].astype(jnp.float32),
                params["conv1_2"]["b"].astype(jnp.float32))
            if spatial_mesh is not None:
                # H-sharded image: shard_map + explicit TH-row halo
                # exchange (the SPMD partitioner cannot split a Pallas
                # custom call; without this the spatial path paid the
                # 10× slower XLA stem chain)
                h = fused_stem_spatial(*stem_args, mesh=spatial_mesh,
                                       axis=spatial_axis,
                                       valid_hw=valid_hw)
            else:
                h = fused_stem(*stem_args, valid_hw=valid_hw,
                               vma=stem_vma)
        if cd is not None:
            h = h.astype(cd)
        stride[0] *= 2
        h = mask(h)       # "where" mode re-zeroes the padded region
    for si, (stage, _, n) in enumerate(VGG_STAGES):
        if use_pallas_stem and stage == "conv1":
            continue
        for i in range(1, n + 1):
            name = f"{stage}_{i}"
            if (s2d_stem and name == "conv1_1"
                    and h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0):
                with jax.named_scope("conv1_1_s2d"):
                    h = mask(jax.nn.relu(conv_s2d_3x3(
                        h, params[name]["w"], params[name]["b"],
                        compute_dtype=cd)))
                continue
            h = cbr(h, name)
        feats[stage] = h
        if si < len(VGG_STAGES) - 1:
            h = max_pool_2x2(h)
            stride[0] *= 2

    with jax.named_scope("conv5_256"):
        f5 = mask(jax.nn.relu(conv2d(
            feats["conv5"], params["conv5_256"]["w"],
            params["conv5_256"]["b"], padding=0, compute_dtype=cd)))
    with jax.named_scope("conv5_256_up"):
        up = upsample2x_bilinear(band(f5, 1), params["conv5_256_up"]["w"])
    stride[0] //= 2                       # back to the stride-8 grid
    f4 = feats["conv4"]
    if f4.dtype == jnp.int8:
        # chained int8 carrier left conv4_3's output on conv5_1's input
        # grid; the fp32 1×1 lateral reads the dequantized value
        f4 = f4.astype(jnp.float32) * (qstate["scales"]["conv5_1"] / 127.0)
    with jax.named_scope("conv4_256"):
        lat4 = jax.nn.relu(conv2d(
            f4, params["conv4_256"]["w"], params["conv4_256"]["b"],
            padding=0, compute_dtype=cd))
    fuse = mask(jnp.concatenate([mask(up), lat4], axis=-1))
    ff = cbr(fuse, "conv4_fuse_final")

    b, hh, ww = ff.shape[0], ff.shape[1], ff.shape[2]
    A = spec.num_anchors
    if spec.different_dilation:
        ff = cbr(ff, "conv4_fuse_final_dim_red")
        ff = band(ff, max(HEAD_DILATIONS))  # one clean band serves all heads
        if int8_amax is not None:
            _record_amax("head", ff)
        cls_list, box_list = [], []
        for k, d in zip(ANCHOR_SCALES, HEAD_DILATIONS):
            with jax.named_scope(f"head_{k}"):
                if int8_mode:
                    hd = _q_conv(ff, "head", d, d)
                else:
                    hd = jax.nn.relu(conv2d(
                        ff, params["head"]["w"], params["head"]["b"],
                        dilation=d, padding=d, compute_dtype=cd))
                cls_list.append(conv2d(
                    hd, params[f"cls_score_{k}"]["w"],
                    params[f"cls_score_{k}"]["b"], padding=0,
                    compute_dtype=cd))
                box_list.append(conv2d(
                    hd, params[f"bbox_pred_{k}"]["w"],
                    params[f"bbox_pred_{k}"]["b"], padding=0,
                    compute_dtype=cd))
        cls_logits = jnp.stack(cls_list, axis=3)      # (B,h,w,A,2)
        bbox_deltas = jnp.stack(box_list, axis=3)     # (B,h,w,A,4)
    else:
        hd = cbr(ff, "head")
        raw_cls = conv2d(hd, params["cls_score"]["w"],
                         params["cls_score"]["b"], padding=0,
                         compute_dtype=cd)
        raw_box = conv2d(hd, params["bbox_pred"]["w"],
                         params["bbox_pred"]["b"], padding=0,
                         compute_dtype=cd)
        # cls channels are [bg_a0.. bg_aA, fg_a0.. fg_aA]
        # (Caffe reshape (1,2,AH,W) pairs channel a with channel A+a).
        cls_logits = raw_cls.reshape(b, hh, ww, 2, A).transpose(0, 1, 2, 4, 3)
        # bbox channels are anchor-major groups of 4.
        bbox_deltas = raw_box.reshape(b, hh, ww, A, 4)

    return {"cls_logits": cls_logits.astype(jnp.float32),
            "bbox_deltas": bbox_deltas.astype(jnp.float32)}


def int8_layer_names(spec: ModelSpec):
    """The convs that run as int8 MXU passes under TPU.PRECISION='int8':
    stages 2-5, the fusion conv(s), and the shared dilated head. The stem
    (fp32 Pallas kernel), 1×1 laterals and score/bbox heads stay fp32."""
    names = [f"{stage}_{i}" for stage, _, n in VGG_STAGES
             if stage != "conv1" for i in range(1, n + 1)]
    names.append("conv4_fuse_final")
    if spec.different_dilation:
        names.append("conv4_fuse_final_dim_red")
    names.append("head")
    return names


def make_qstate(params, spec: ModelSpec, amax):
    """Static int8 quantization state from a calibration amax dict (see
    forward(int8_amax=...) / collect_int8_amax): per-layer calibrated
    activation max + per-output-channel int8 weights baked once. Passing
    the result as forward(qstate=...) replaces the dynamic per-tensor
    max-reduces with fused elementwise quantizes and 4×-smaller weight
    reads (the measured difference is the whole int8 win — PERF_NOTES)."""
    from smallhardface_tpu.models.layers import quantize_weights_int8
    scales, qw, s_w = {}, {}, {}
    for n in int8_layer_names(spec):
        scales[n] = jnp.float32(amax[n])
        qw[n], s_w[n] = quantize_weights_int8(params[n]["w"])
    return {"scales": scales, "qw": qw, "s_w": s_w}


def collect_int8_amax(params, spec: ModelSpec, xs, mask_mode="where",
                      pallas_stem=False):
    """Calibrate activation ranges: run fp32 forwards over xs (iterable of
    (1,H,W,3) mean-subtracted arrays, H/W multiples of 16) and return the
    per-layer max|input| dict for make_qstate. One small stacked readback
    per image (tunnel-friendly)."""
    import numpy as np

    keys = sorted(int8_layer_names(spec))

    def one(x):
        amax = {}
        forward(params, x, spec, mask_mode=mask_mode,
                pallas_stem=pallas_stem, int8_amax=amax)
        return jnp.stack([amax[k] for k in keys])

    fn = jax.jit(one)
    total = {}
    for x in xs:
        vals = np.asarray(fn(jnp.asarray(x)))
        for k, v in zip(keys, vals):
            total[k] = max(total.get(k, 0.0), float(v))
    return total
