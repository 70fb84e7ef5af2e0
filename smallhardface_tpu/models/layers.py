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


def max_pool_2x2(x):
    """2×2/2 max pool with Caffe's ceil-mode output size.

    Caffe computes ceil((H-k)/s)+1 (pooling_layer.cpp); for odd H that
    requires one pixel of -inf padding at the bottom/right.
    """
    h, w = x.shape[1], x.shape[2]
    pad_h = h % 2
    pad_w = w % 2
    pads = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
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
