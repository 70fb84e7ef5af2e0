"""Primitive NN ops for the detector, NHWC layout, XLA-native.

These replace the Caffe layer zoo the reference model actually uses
(/root/reference/caffe/src/caffe/layers/: Convolution incl. dilation, ReLU,
MaxPool, bilinear group Deconvolution, Concat, Softmax) with jitted
lax primitives that fuse under XLA and map onto the MXU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def conv2d(x, w, b=None, *, stride=1, dilation=1, padding="SAME",
           compute_dtype=None):
    """NHWC conv. ``w``: HWIO. ``padding`` may be 'SAME', an int, or explicit.

    For dilation d with a k×k kernel the Caffe templates use pad = d*(k-1)/2
    which equals SAME for odd k; we pass explicit pads to be exact.
    """
    if isinstance(padding, str):
        pads = padding
    else:
        p = int(padding)
        pads = ((p, p), (p, p))
    if compute_dtype is not None:
        # bf16 path: activations stay in compute_dtype end-to-end (the
        # caller converts once at the network boundary); the MXU still
        # accumulates in f32 via preferred_element_type.
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        acc = jnp.float32
    else:
        acc = jnp.float32
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=pads,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def quantize_weights_int8(w):
    """Per-output-channel symmetric int8 weight quantization.

    Returns (qw int8 HWIO, s_w fp32 (O,)) with w ≈ qw * s_w. Done once
    (detector init / qstate build) so serving convs read 4× less weight
    HBM and skip the per-call requantize pass."""
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    qw = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return qw, s_w


def conv2d_int8(x, w, b=None, *, stride=1, dilation=1, padding="SAME",
                s_x=None, qw=None, s_w=None):
    """Quantized int8 conv: fp32 in, fp32 out, int8 MXU pass.

    The v5e MXU runs int8×int8→int32 at double the bf16 rate (measured
    379.8 TOPS at 16384³ vs the 394 spec peak, scripts/stem_probe.py).

    Two activation-scale modes:
      - s_x=None (dynamic): per-tensor symmetric scale max|x|/127
        computed on device — no calibration data needed, but the global
        max-reduce is an extra serializing pass over every activation
        tensor, which eats most of the MXU win end-to-end (measured ~8%
        whole-forward, PERF_NOTES round 3).
      - s_x given (static, from calibration — see
        models/detector.collect_int8_amax / make_qstate): the quantize
        is pure elementwise and fuses; values beyond ±127·s_x saturate
        (symmetric clip), the standard post-training-quantization
        contract.
    Weights: pass (qw, s_w) prebaked via quantize_weights_int8, or leave
    None to quantize w on the fly (per-output-channel symmetric either
    way). int32 accumulation, fp32 dequant + bias.

    Exact zeros stay exact zeros (round(0)=0), so the valid-extent
    masking discipline is preserved — but a DYNAMIC scale is a global
    reduce over the tensor, so bucket-padding garbage beyond the valid
    extent would couple into inside-valid values: callers must run
    mask_mode "exact" or "where" (models/detector.forward enforces it).

    Inference-only: rounding has no useful gradient (no VJP defined).
    """
    if isinstance(padding, str):
        pads = padding
    else:
        p = int(padding)
        pads = ((p, p), (p, p))
    if s_x is None:
        s_x = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    if qw is None:
        qw, s_w = quantize_weights_int8(w)
    acc = lax.conv_general_dilated(
        q, qw,
        window_strides=(stride, stride),
        padding=pads,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_x * s_w)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d_int8_chain(q, qw, s_in, s_w, b, *, stride=1, dilation=1,
                      padding="SAME", s_out=None):
    """One link of a fully-quantized conv chain: int8 in, int8 (or fp32)
    out.

    q is an int8 activation carrier on the grid value = q·s_in; qw/s_w
    are prebaked per-output-channel weights (quantize_weights_int8). The
    conv accumulates in int32; the epilogue dequantizes, adds bias,
    applies ReLU, and — when s_out is given — REquantizes onto the
    successor layer's calibrated grid, all as one fused elementwise
    chain writing int8. Keeping the carrier int8 across a chain is
    measured 1.4–1.5× faster than bf16 carriers at production shapes
    (PERF_NOTES round 3: the layer-wise fp32-carrier int8 mode loses
    the MXU win to quantize/dequantize HBM passes; this chain is how
    TPU.PRECISION='int8' + calibration actually pays).

    Exact zeros stay exact zeros through round(relu(·)/s) — the
    valid-extent masking discipline holds on the int8 carrier.
    Inference-only (no VJP).
    """
    if isinstance(padding, str):
        pads = padding
    else:
        p = int(padding)
        pads = ((p, p), (p, p))
    acc = lax.conv_general_dilated(
        q, qw,
        window_strides=(stride, stride),
        padding=pads,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    t = acc.astype(jnp.float32) * (s_in * s_w)
    if b is not None:
        t = t + b.astype(t.dtype)
    t = jax.nn.relu(t)
    if s_out is None:
        return t
    return jnp.clip(jnp.round(t / s_out), -127, 127).astype(jnp.int8)


def max_pool_2x2(x):
    """2×2/2 max pool with Caffe's ceil-mode output size.

    Caffe computes ceil((H-k)/s)+1 (pooling_layer.cpp); for odd H that
    requires one pixel of -inf padding at the bottom/right.
    """
    h, w = x.shape[1], x.shape[2]
    pad_h = h % 2
    pad_w = w % 2
    pads = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
    # identity for max: -inf for floats, dtype min for int8 carriers
    # (the chained quantized mode pools int8 activations directly —
    # max commutes with the positive per-tensor scale)
    init = (x.dtype.type(jnp.iinfo(x.dtype).min)
            if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=pads)


def bilinear_kernel(factor: int, channels: int, dtype=np.float32):
    """Caffe 'bilinear' filler weights for a depthwise upsampling deconv
    (/root/reference/caffe/include/caffe/filler.hpp BilinearFiller):
    k = 2f - f%2, c = (2f - 1 - f%2) / (2f)."""
    k = 2 * factor - factor % 2
    c = (2 * factor - 1 - factor % 2) / (2.0 * factor)
    og = np.arange(k, dtype=np.float64)
    v = 1.0 - np.abs(og / factor - c)
    kern2d = np.outer(v, v)
    w = np.zeros((k, k, 1, channels), dtype=dtype)
    w[:, :, 0, :] = kern2d[:, :, None]
    return w


def upsample2x_bilinear(x, w):
    """Depthwise transposed conv, kernel 4, stride 2, pad 1: output = 2H×2W,
    matching Caffe Deconvolution(group=C, bilinear, lr_mult 0)
    (/root/reference/models/test_different_dilation_template.prototxt:395-410).

    Implemented as a fractionally-strided conv: lhs_dilation 2 with explicit
    padding (k-1-p) = 2 per side. The bilinear kernel is symmetric so no
    spatial flip is needed.
    """
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def softmax2(logits, axis=-1):
    return jax.nn.softmax(logits, axis=axis)


def conv_s2d_3x3(x, w, b, *, compute_dtype=None):
    """3×3 stride-1 SAME conv computed in space-to-depth form — exact
    re-expression for MXU efficiency on tiny input channel counts.

    A direct 3×3 conv over C=3 contracts only 27 values per output
    against the MXU's 128 lanes (~21 % utilization): the compiled cost
    model charges conv1_1 22 % of the whole VGG forward for 0.5 % of its
    FLOPs (tools/layer_time.py). Regrouped over 2×2 pixel blocks the same
    dot products become a 3×3 conv on an (H/2, W/2, 4C) grid producing
    (H/2, W/2, 4·Cout) — contraction 4·9·C (=108 for C=3), nearly a full
    MXU pass. Each output value is the SAME sum of products (float
    reassociation only); implicit zero padding maps exactly because H and
    W are even (×16 bucket shapes), so the s2d grid's halo rows represent
    precisely the original halo rows.

    x: (B, H, W, C) with H, W even, ZERO beyond any valid extent the
    caller tracks (the band discipline needs no in-stem masking: the
    output returns to full-res layout before the next conv's band).
    w: (3, 3, C, Co). Returns conv+bias at full resolution (B, H, W, Co).
    """
    bb, hh, ww, c = x.shape
    co = w.shape[-1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    # pack 2×2 pixel blocks into channels: idx = a*(2C) + b*C + ci
    xs = x.reshape(bb, hh // 2, 2, ww // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(bb, hh // 2, ww // 2, 4 * c)
    # scatter the 3×3 taps into the equivalent s2d kernel:
    # full-res tap row r = a + dy - 1 lands in s2d row offset r//2 at
    # sub-position r%2 (floor division keeps the top halo at offset −1)
    w2 = jnp.zeros((3, 3, 4 * c, 4 * co), w.dtype)
    for a in (0, 1):
        for bcol in (0, 1):
            for dy in range(3):
                for dx in range(3):
                    r, s = a + dy - 1, bcol + dx - 1
                    ri, ci_sub = r // 2 + 1, r % 2
                    si, cj_sub = s // 2 + 1, s % 2
                    w2 = w2.at[
                        ri, si,
                        ci_sub * 2 * c + cj_sub * c:
                        ci_sub * 2 * c + cj_sub * c + c,
                        (a * 2 + bcol) * co:(a * 2 + bcol + 1) * co,
                    ].add(w[dy, dx])
    if compute_dtype is not None:
        w2 = w2.astype(compute_dtype)
    out = lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(xs.dtype)
    if b is not None:
        out = out + jnp.tile(b, 4).astype(out.dtype)
    # depth-to-space back to the full-resolution layout
    return out.reshape(bb, hh // 2, ww // 2, 2, 2, co).transpose(
        0, 1, 3, 2, 4, 5).reshape(bb, hh, ww, co)


def normalize_l2(x, scale, *, across_spatial=True, eps=1e-10):
    """SSD NormalizeLayer (fork-added, proto id 149): L2-normalize then
    multiply by a learnable scale
    (/root/reference/caffe/src/caffe/layers/normalize_layer.cpp:85-130,
    proto defaults caffe.proto:896-904). Unused by the shipped templates;
    provided for model-surgery parity with the vendored fork's layer zoo.

    x: (B, H, W, C) NHWC (the reference is NCHW; channels = last here).
    scale: scalar () for channel_shared=true, else (C,).
    across_spatial=True normalizes each sample over all of H·W·C;
    False normalizes each spatial position across channels. eps is added
    to the squared sum before the square root, as in the reference.
    """
    axes = (1, 2, 3) if across_spatial else (-1,)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True) + eps)
    return (x / norm) * scale


def permute(x, order):
    """SSD PermuteLayer (fork-added, proto id 150): generic axis
    permutation (/root/reference/caffe/src/caffe/layers/permute_layer.cpp:
    8-45). Unused by the shipped templates; equals jnp.transpose."""
    return jnp.transpose(x, order)
