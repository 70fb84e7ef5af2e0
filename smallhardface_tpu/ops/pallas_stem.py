"""Fused VGG stem (conv1_1 + ReLU + conv1_2 + ReLU + pool1) as one Pallas
TPU kernel.

Why: the XLA-compiled stem chain moves every intermediate through HBM —
conv1_1 writes 692 MB of activations at 1408×1920, conv1_2 reads+writes
them again, pool1 makes another pass — and the measured chain wall
(scripts/stem_probe.py, tools/layer_time.py --bisect) runs ~10.6 ms
against a ~4.3 ms roofline: the excess is HBM traffic plus layout
conversions between the conv/pool fusions. This kernel keeps both
intermediates in VMEM row strips and writes only the pooled output
(173 MB), reading the 3-channel input once.

Layout: the kernel works channel-first — x arrives as (B, 3, H, W) (the
caller transposes; 132 MB, one cheap relayout) so W rides the 128-lane
axis un-padded; the pooled output is emitted NHWC (B, H/2, W/2, 64), the
layout the rest of the network consumes. Convolutions run as row-wise
MXU dots: conv1_1 as a (64, 27) × (27, W+2) im2col dot per row, conv1_2
as 9 accumulated (64, 64) × (64, W) tap dots per row. Dot inputs are
cast to bfloat16 (one MXU pass — the same family of rounding JAX's
default fp32 precision applies, measured in PERF_NOTES round 3) with
float32 accumulation.

Masking: the kernel reproduces the exact-parity discipline of
models/detector.forward for bucket-padded inputs: the input and the
conv1_1 activations are zeroed outside [0, valid) in both axes before
each conv consumes them (the reference's implicit zero padding — the
halo must be exactly zero, see detector.cbr). Pass valid = (H, W) for
unpadded inputs.

Constraints: H % 8 == 0 (row-strip grid; ×16 bucket shapes guarantee
it), W % 128 == 0, C_in = 3, C_out = 64, fp32 in/out. The conv1_1
activations are held in VMEM as bfloat16 (halves the largest scratch
buffer; the tap dots already run in bf16 like XLA's default-precision
convs, so this adds one more bf16 rounding on the stored activation).

Reference for the op semantics being fused:
/root/reference/models/test_template.prototxt:17-77 (conv1_1, relu1_1,
conv1_2, relu1_2, pool1) — 3×3 pad-1 convs, 2×2/2 max pool.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8            # full-resolution rows per grid step
# (input blocks need sublane-divisible row counts: TH % 8 == 0)


def _kernel(scal_ref, xp_ref, xc_ref, xn_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, out_ref, xs_ref, c1_ref, c2_ref, xcol_ref, *, H, W):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    vh = scal_ref[0]
    vw = scal_ref[1]

    # ---- assemble the haloed input strip: rows [i*TH-2, i*TH+TH+2) ----
    # xs (TH+4, 3, W+4) rows-leading; columns offset by 2 (W halo),
    # rows by 2.
    xs_ref[2:TH + 2, :, 2:W + 2] = jnp.transpose(xc_ref[0], (1, 0, 2))
    xs_ref[0:2, :, 2:W + 2] = jnp.transpose(
        xp_ref[0, :, TH - 2:TH, :], (1, 0, 2))
    xs_ref[TH + 2:TH + 4, :, 2:W + 2] = jnp.transpose(
        xn_ref[0, :, 0:2, :], (1, 0, 2))
    xs_ref[:, :, 0:2] = jnp.zeros((TH + 4, 3, 2), jnp.float32)
    xs_ref[:, :, W + 2:W + 4] = jnp.zeros((TH + 4, 3, 2), jnp.float32)

    @pl.when(i == 0)
    def _():
        xs_ref[0:2] = jnp.zeros((2, 3, W + 4), jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        xs_ref[TH + 2:TH + 4] = jnp.zeros((2, 3, W + 4), jnp.float32)

    # zero beyond the valid extent (exact-parity masking: every conv must
    # read exact zeros outside [0, valid))
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (TH + 4, 1, W + 4), 0) + i * TH - 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (TH + 4, 1, W + 4), 2) - 2
    xs_inside = (rows < vh) & (cols < vw)
    xs_ref[:] = jnp.where(xs_inside, xs_ref[:], 0.0)

    # ---- conv1_1 rows: c1 row r1 is global row i*TH - 1 + r1 ----
    c1_cols = jax.lax.broadcasted_iota(jnp.int32, (64, W + 2), 1) - 1
    xcol_ref[27:32] = jnp.zeros((5, W + 2), jnp.float32)

    def row1(r1, _):
        for t in range(9):
            dy, dx = t // 3, t % 3
            xcol_ref[t * 3:t * 3 + 3] = \
                xs_ref[r1 + dy, :, dx:dx + W + 2]
        acc = jax.lax.dot(
            w1_ref[:].astype(jnp.bfloat16),
            xcol_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)          # (64, W+2)
        act = jnp.maximum(acc + b1_ref[:], 0.0)
        grow = i * TH - 1 + r1
        inside = (grow >= 0) & (grow < vh) & (c1_cols >= 0) & \
            (c1_cols < vw)
        c1_ref[r1] = jnp.where(inside, act, 0.0).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, TH + 2, row1, 0)

    # ---- conv1_2 rows: c2 row r2 is global row i*TH + r2 ----
    def row2(r2, _):
        acc = jnp.broadcast_to(b2_ref[:], (64, W))
        for t in range(9):
            dy, dx = t // 3, t % 3
            sl = c1_ref[r2 + dy, :, dx:dx + W]
            acc = acc + jax.lax.dot(
                w2_ref[t].astype(jnp.bfloat16), sl,
                preferred_element_type=jnp.float32)
        c2_ref[r2] = jnp.maximum(acc, 0.0)
        return 0

    jax.lax.fori_loop(0, TH, row2, 0)

    # ---- 2×2/2 max pool, emitted channel-last ----
    c2 = c2_ref[:]                                       # (TH, 64, W)
    rmax = jnp.max(c2.reshape(TH // 2, 2, 64, W), axis=1)
    q = jnp.transpose(rmax, (0, 2, 1))                   # (TH/2, W, 64)
    pooled = jnp.max(q.reshape(TH // 2, W // 2, 2, 64), axis=2)
    out_ref[0] = pooled


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_call(xcf, w1col, b1, w2taps, b2, valid, *, interpret=False):
    B, _, H, W = xcf.shape
    grid = (B, H // TH)

    # index_map signature under scalar prefetch: (*grid_indices, scal_ref)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TH, W),
                         lambda b, i, s: (b, 0, jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((1, 3, TH, W), lambda b, i, s: (b, 0, i, 0)),
            pl.BlockSpec((1, 3, TH, W),
                         lambda b, i, s: (
                             b, 0, jnp.minimum(i + 1, H // TH - 1), 0)),
            pl.BlockSpec((64, 32), lambda b, i, s: (0, 0)),
            pl.BlockSpec((64, 1), lambda b, i, s: (0, 0)),
            pl.BlockSpec((9, 64, 64), lambda b, i, s: (0, 0, 0)),
            pl.BlockSpec((64, 1), lambda b, i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH // 2, W // 2, 64),
                               lambda b, i, s: (b, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((TH + 4, 3, W + 4), jnp.float32),
            pltpu.VMEM((TH + 2, 64, W + 2), jnp.bfloat16),
            pltpu.VMEM((TH, 64, W), jnp.float32),
            pltpu.VMEM((32, W + 2), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, 64),
                                       jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid, xcf, xcf, xcf, w1col, b1, w2taps, b2)


def prep_weights(w1, b1, w2, b2):
    """HWIO stem weights → the kernel's dot layouts:
    w1col (64, 32): columns ordered (dy, dx, ci) + 5 zero columns (the
    im2col scratch is sublane-padded to 32); w2taps (9, 64, 64) = per-tap
    (co, ci) matrices, taps ordered (dy, dx)."""
    w1col = jnp.transpose(w1, (3, 0, 1, 2)).reshape(64, 27)
    w1col = jnp.pad(w1col, ((0, 0), (0, 5)))
    w2taps = jnp.transpose(w2, (0, 1, 3, 2)).reshape(9, 64, 64)
    return (w1col, jnp.reshape(b1, (64, 1)),
            w2taps, jnp.reshape(b2, (64, 1)))


def fused_stem(x, w1, b1, w2, b2, valid_hw=None, *, interpret=False):
    """relu(conv3x3(relu(conv3x3(x, w1, b1)), w2, b2)) → 2×2/2 max pool,
    with exact valid-extent masking.

    x: (B, H, W, 3) float32, H % 8 == 0, W % 128 == 0.
    valid_hw: (vh, vw) scalars or None (= full extent).
    Returns (B, H/2, W/2, 64) float32.
    """
    B, H, W, C = x.shape
    assert C == 3 and H % TH == 0 and W % 128 == 0, (B, H, W, C)
    if valid_hw is None:
        valid = jnp.asarray([H, W], jnp.int32)
    else:
        valid = jnp.stack([jnp.asarray(valid_hw[0], jnp.int32),
                           jnp.asarray(valid_hw[1], jnp.int32)])
    xcf = jnp.transpose(x, (0, 3, 1, 2))
    w1col, b1c, w2taps, b2c = prep_weights(w1, b1, w2, b2)
    return _stem_call(xcf, w1col, b1c, w2taps, b2c, valid,
                      interpret=interpret)
