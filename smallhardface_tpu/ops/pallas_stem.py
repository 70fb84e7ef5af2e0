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
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8            # full-resolution rows per grid step

# Tests set True to run the kernels through the Pallas interpreter on
# CPU: backend_ok() then lets detector.forward engage the stem off-TPU,
# and every kernel entry point forces interpret mode. Production never
# touches this — off-TPU the forward silently takes the XLA chain.
TESTING_INTERPRET = False


def backend_ok():
    """The Mosaic kernel only lowers on TPU (default.toml: 'falls back
    silently otherwise'); detector.forward consults this before routing
    the stem through the kernel."""
    return TESTING_INTERPRET or jax.default_backend() == "tpu"
# (input blocks need sublane-divisible row counts: TH % 8 == 0)


def _kernel(scal_ref, xp_ref, xc_ref, xn_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, out_ref, xs_ref, c1_ref, c2_ref, xcol_ref, *, H, W):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    vh = scal_ref[0]
    vw = scal_ref[1]
    r0 = scal_ref[2]        # first valid ROW: rows < r0 are masked like
    # rows >= vh (0 for whole images; fused_stem_spatial sets it on the
    # top shard, whose halo rows are zeros standing in for image padding)

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
    xs_inside = (rows >= r0) & (rows < vh) & (cols < vw)
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
        inside = (grow >= r0) & (grow < vh) & (c1_cols >= 0) & \
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


def _pvary(vma, *args):
    """Promote replicated operands to varying over `vma` — pallas_call
    requires every operand to carry the SAME varying-axis set under
    shard_map (the weights are replicated while the activations vary)."""
    if not vma:
        return args
    return tuple(jax.lax.pcast(a, tuple(vma), to="varying")
                 if not (jax.typeof(a).vma & set(vma)) else a
                 for a in args)


@functools.partial(jax.jit, static_argnames=("interpret", "vma"))
def _stem_call(xcf, w1col, b1, w2taps, b2, valid, *, interpret=False,
               vma=None):
    xcf, w1col, b1, w2taps, b2, valid = _pvary(
        vma, xcf, w1col, b1, w2taps, b2, valid)
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
                                       jnp.float32,
                                       vma=frozenset(vma) if vma else None),
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


def fused_stem(x, w1, b1, w2, b2, valid_hw=None, *, valid_r0=0,
               interpret=False, vma=None):
    """relu(conv3x3(relu(conv3x3(x, w1, b1)), w2, b2)) → 2×2/2 max pool,
    with exact valid-extent masking.

    x: (B, H, W, 3) float32, H % 8 == 0, W % 128 == 0.
    valid_hw: (vh, vw) scalars or None (= full extent).
    valid_r0: first valid ROW — rows < valid_r0 are masked exactly like
    rows >= vh (0 for whole images; fused_stem_spatial passes the top
    shard's halo offset so zero halo rows reproduce image-top padding).
    vma: varying-axis names under shard_map (like ops/pallas_iou.py).
    Returns (B, H/2, W/2, 64) float32.

    Differentiable: a custom VJP runs the fused backward kernel below,
    emitting d(w1, b1, w2, b2) only (the image gets zeros — the detector
    never differentiates wrt the input). Exact backward parity with the
    XLA composition requires EVEN valid extents (training valid_hw is
    stride-8-aligned) and an even valid_r0; the primal has no such
    restriction.
    """
    B, H, W, C = x.shape
    assert C == 3 and H % TH == 0 and W % 128 == 0, (B, H, W, C)
    interpret = interpret or TESTING_INTERPRET
    if valid_hw is None:
        valid_hw = (H, W)
    valid = jnp.stack([jnp.asarray(valid_hw[0], jnp.int32),
                       jnp.asarray(valid_hw[1], jnp.int32),
                       jnp.asarray(valid_r0, jnp.int32)])
    return _stem_op(x, w1, b1, w2, b2, valid, interpret,
                    tuple(vma) if vma else None)


def fused_stem_spatial(x, w1, b1, w2, b2, mesh, axis="sp", valid_hw=None,
                       *, interpret=False):
    """fused_stem over an H-sharded image: shard_map + explicit halo
    exchange on ICI instead of the SPMD partitioner (which cannot
    partition a Pallas custom call — the reason the spatial path
    previously fell back to the 10× slower XLA stem chain).

    Each shard ppermutes its TH edge rows to both neighbors, runs the
    kernel on the (Hs + 2·TH)-row extended strip, and keeps its own
    pooled rows. Boundary semantics are exact: edge shards receive ZERO
    halos from ppermute, and the kernel's valid row window
    [r0, r1) × [0, vw) zeroes the conv1_1 activations in the top shard's
    halo — reproducing the reference's implicit zero padding bit-for-bit
    (a zero INPUT halo alone would leave relu(b1) in the conv1_1 halo
    rows, which conv1_2's boundary taps must read as exact zeros —
    the same discipline as detector.cbr).

    x: (B, H, W, 3) float32 with H sharded over `axis`; H % (n·TH) == 0.
    valid_hw: GLOBAL (vh, vw) scalars or None.
    Returns (B, H/2, W/2, 64), H/2 sharded over `axis`.

    Differentiable: a custom VJP (weight grads only, like fused_stem)
    shard_maps the fused backward kernel per shard — true x halos via
    ppermute, the shard's OWN dy rows only (halo dy = 0), partial
    d(w1,b1,w2,b2) psum'd over the axis. Exactness argument: dw is
    linear in dy for fixed relu/pool masks, the masks are recomputed
    from true x everywhere a nonzero-dy term reaches (≤ 3 rows past a
    shard edge, inside the TH-row halo), and every dy entry is nonzero
    in exactly one shard — so the psum of partials equals the global
    backward term-for-term. Needs an even global vh (training valid
    extents are stride-8-aligned), matching fused_stem's even-valid
    backward rule. This is what lets spatial TRAINING keep the fused
    stem (train_loop._make_loss_fn passes the mesh through).

    Cost note: the exchanged halo is a full TH-row strip per side (strip
    alignment of the kernel grid) though only 3 rows feed the kept
    output — each shard computes Hs + 2·TH rows for Hs, an overlap
    fraction of 2·TH·n/H. detector.forward gates engagement to
    Hs ≥ 4·TH so the redundancy stays ≤ 50 %; below that the XLA chain
    wins on tiny levels anyway.
    """
    interpret = interpret or TESTING_INTERPRET
    B, H, W, C = x.shape
    n = mesh.shape[axis]
    assert H % (n * TH) == 0, (H, n, TH)
    if valid_hw is None:
        valid_hw = (H, W)
    vh = jnp.asarray(valid_hw[0], jnp.int32)
    vw = jnp.asarray(valid_hw[1], jnp.int32)
    return _stem_sp_op(mesh, axis, interpret, x, w1, b1, w2, b2, vh, vw)


def _shard_ctx(mesh, axis):
    """Mesh to hand the spatial shard_maps, plus whether we are NESTED
    inside an already-manual region. The grouped train step
    (train_loop.make_train_step_grouped) traces this op inside a
    shard_map that is manual over 'data' with 'sp' auto; there jax
    requires the inner shard_map to be built from the CONTEXT
    AbstractMesh (whose 'data' axis is typed Manual), not the concrete
    Mesh — and the nested region runs untyped (check_vma=False, no vma
    annotation), matching the outer step's check_vma=False. Outside any
    manual region (plain-jit spatial step, eval) the context mesh is
    empty and the concrete mesh passes through unchanged."""
    from jax.sharding import get_abstract_mesh, AxisType
    ctx = get_abstract_mesh()
    if (ctx is not None and getattr(ctx, "shape", None)
            and axis in ctx.shape):
        types = dict(zip(ctx.axis_names, getattr(ctx, "axis_types", ())))
        if types.get(axis) == AxisType.Manual:
            # the stem builds its OWN shard_map over `axis`; a caller
            # already manual over it would double-partition — fail with
            # a nameable error instead of a deep partitioner crash
            raise NotImplementedError(
                f"fused_stem_spatial traced inside a region already "
                f"manual over {axis!r}; call it from an Auto-{axis} "
                "context (the grouped train step is manual over 'data' "
                "only)")
        if AxisType.Manual in types.values():
            return ctx, True
    return mesh, False


def _stem_sp_fwd_impl(mesh, axis, interpret, x, w1, b1, w2, b2, vh, vw):
    from jax.sharding import PartitionSpec as P

    B, H, W, C = x.shape
    n = mesh.shape[axis]
    Hs = H // n
    sm_mesh, nested = _shard_ctx(mesh, axis)
    untyped = interpret or nested

    def body(x_loc, w1, b1, w2, b2, vh, vw):
        i = jax.lax.axis_index(axis)
        down = [(j, j + 1) for j in range(n - 1)]   # shard j → j+1
        up = [(j + 1, j) for j in range(n - 1)]     # shard j+1 → j
        # halo rows ride ICI; edge shards receive zeros (ppermute fills
        # unaddressed destinations with 0)
        top = jax.lax.ppermute(x_loc[:, Hs - TH:], axis, down)
        bot = jax.lax.ppermute(x_loc[:, :TH], axis, up)
        x_ext = jnp.concatenate([top, x_loc, bot], axis=1)
        # ext row e ↔ global row i·Hs − TH + e; the valid global window
        # [0, vh) maps to ext rows [TH − i·Hs, vh − i·Hs + TH)
        r0 = jnp.maximum(TH - i * Hs, 0)
        r1 = jnp.clip(vh - i * Hs + TH, 0, Hs + 2 * TH)
        # interpret mode (CPU tests): the Pallas HLO interpreter cannot
        # yet thread varying-axis types through its internal slicing, so
        # the shard_map runs with check_vma=False and no vma annotation;
        # the compiled TPU path keeps full vma checking (same discipline
        # as the training-DP stem call)
        out = fused_stem(x_ext, w1, b1, w2, b2, valid_hw=(r1, vw),
                         valid_r0=r0, interpret=interpret,
                         vma=None if untyped else (axis,))
        # own pooled rows: ext pool rows [TH/2, TH/2 + Hs/2)
        return jax.lax.slice_in_dim(out, TH // 2, TH // 2 + Hs // 2,
                                    axis=1)

    return shard_map(
        body, mesh=sm_mesh,
        in_specs=(P(None, axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, axis),
        check_vma=not untyped)(x, w1, b1, w2, b2, vh, vw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _stem_sp_op(mesh, axis, interpret, x, w1, b1, w2, b2, vh, vw):
    return _stem_sp_fwd_impl(mesh, axis, interpret, x, w1, b1, w2, b2,
                             vh, vw)


def _stem_sp_vjp_fwd(mesh, axis, interpret, x, w1, b1, w2, b2, vh, vw):
    out = _stem_sp_fwd_impl(mesh, axis, interpret, x, w1, b1, w2, b2,
                            vh, vw)
    return out, (x, w1, b1, w2, b2, vh, vw)


def _stem_sp_vjp_bwd(mesh, axis, interpret, res, dy):
    from jax.sharding import PartitionSpec as P

    x, w1, b1, w2, b2, vh, vw = res
    B, H, W, _ = x.shape
    n = mesh.shape[axis]
    Hs = H // n
    sm_mesh, nested = _shard_ctx(mesh, axis)
    untyped = interpret or nested

    def body(x_loc, dy_loc, w1, b1, w2, b2, vh, vw):
        i = jax.lax.axis_index(axis)
        down = [(j, j + 1) for j in range(n - 1)]
        up = [(j + 1, j) for j in range(n - 1)]
        # true x halos (the grad kernel recomputes c1/c2 masks up to
        # ±3 rows beyond the shard edge; TH = 8 rows cover it)...
        top = jax.lax.ppermute(x_loc[:, Hs - TH:], axis, down)
        bot = jax.lax.ppermute(x_loc[:, :TH], axis, up)
        x_ext = jnp.concatenate([top, x_loc, bot], axis=1)
        # ...but ZERO dy halos: each dy row drives dw contributions in
        # exactly one shard (its owner), so the psum below adds each
        # (activation row, dy entry) term exactly once — no exchange
        zq = jnp.zeros((B, TH // 2, W // 2, 64), jnp.float32)
        dy_ext = jnp.concatenate([zq, dy_loc, zq], axis=1)
        r0 = jnp.maximum(TH - i * Hs, 0)
        r1 = jnp.clip(vh - i * Hs + TH, 0, Hs + 2 * TH)
        valid = jnp.stack([r1.astype(jnp.int32), vw.astype(jnp.int32),
                           r0.astype(jnp.int32)])
        xcf = jnp.transpose(x_ext, (0, 3, 1, 2))
        dycf = jnp.transpose(dy_ext, (0, 1, 3, 2))
        w1col, b1c, w2taps_t, b2c = prep_weights(w1, b1, w2, b2)
        w2taps = jnp.reshape(w2, (9, 64, 64))
        g = _stem_grad_call(xcf, dycf, w1col, b1c, w2taps_t, w2taps,
                            b2c, valid, interpret=interpret,
                            vma=None if untyped else (axis,))
        return jax.tree_util.tree_map(
            lambda t: jax.lax.psum(t, axis), g)

    dw1, db1, dw2, db2 = shard_map(
        body, mesh=sm_mesh,
        in_specs=(P(None, axis), P(None, axis)) + (P(),) * 6,
        out_specs=(P(), P(), P(), P()),
        check_vma=not untyped)(x, dy, w1, b1, w2, b2, vh, vw)
    return (jnp.zeros_like(x), dw1, db1, dw2, db2,
            _np_float0_like(vh), _np_float0_like(vw))


# (_stem_grad_call / _np_float0_like are defined below — resolved at
# trace time, not at registration)
_stem_sp_op.defvjp(_stem_sp_vjp_fwd, _stem_sp_vjp_bwd)



# ---------------------------------------------------------------------------
# Fused stem BACKWARD: d(w1, b1, w2, b2) in one kernel.
#
# XLA's gradient of the stem chain measures ~22 ms at 768×1024 (15 % of a
# train step): SelectAndScatter for the pool plus full-resolution
# correlation passes, each round-tripping ~200 MB activations through
# HBM. This kernel recomputes c1 in VMEM row strips (conv1 is ~5 % of the
# stem FLOPs), derives the pool/relu backward in-register, and emits ONLY
# the parameter gradients (~160 KB) — the input image needs no gradient,
# so nothing large is ever written back.
#
# Gradient semantics match the XLA composition:
#   - pool backward routes dy to the FIRST maximal element of the 2×2
#     window in row-major order (reduce_window's tie order);
#   - relu backward masks with (activation > 0);
#   - the valid-extent masking's vjp falls out of the recomputed MASKED
#     activations (zero there ⇒ relu masks discard those gradients); dy
#     is additionally zeroed beyond the pooled valid extent.
# Dots run in bf16 with f32 accumulation, like the forward.
# ---------------------------------------------------------------------------


def _grad_kernel(scal_ref, xp_ref, xc_ref, xn_ref, dyp_ref, dyc_ref,
                 dyn_ref, w1_ref, b1_ref, w2t_ref, w2_ref, b2_ref,
                 dw1_ref, db1_ref, dw2_ref, db2_ref,
                 xs_ref, c1_ref, dy_ref, dp2_ref, xcol_ref, *, H, W):
    i = pl.program_id(1)
    b = pl.program_id(0)
    n_i = pl.num_programs(1)
    vh = scal_ref[0]
    vw = scal_ref[1]
    r0 = scal_ref[2]        # first valid row (see the forward kernel);
    # exact parity needs an EVEN r0, like the even-valid rule below
    HB = TH // 2            # pooled rows per strip
    WB = W // 2

    @pl.when((b == 0) & (i == 0))
    def _():
        dw1_ref[:] = jnp.zeros((32, 64), jnp.float32)
        db1_ref[:] = jnp.zeros((8, 64), jnp.float32)
        dw2_ref[:] = jnp.zeros((9 * 64, 64), jnp.float32)
        db2_ref[:] = jnp.zeros((8, 64), jnp.float32)

    # ---- assemble x rows [i*TH-4, i*TH+TH+4) → xs (TH+8, 3, W+4) ----
    xs_ref[4:TH + 4, :, 2:W + 2] = jnp.transpose(xc_ref[0], (1, 0, 2))
    xs_ref[0:4, :, 2:W + 2] = jnp.transpose(
        xp_ref[0, :, TH - 4:TH, :], (1, 0, 2))
    xs_ref[TH + 4:TH + 8, :, 2:W + 2] = jnp.transpose(
        xn_ref[0, :, 0:4, :], (1, 0, 2))
    xs_ref[:, :, 0:2] = jnp.zeros((TH + 8, 3, 2), jnp.float32)
    xs_ref[:, :, W + 2:W + 4] = jnp.zeros((TH + 8, 3, 2), jnp.float32)

    @pl.when(i == 0)
    def _():
        xs_ref[0:4] = jnp.zeros((4, 3, W + 4), jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        xs_ref[TH + 4:TH + 8] = jnp.zeros((4, 3, W + 4), jnp.float32)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (TH + 8, 1, W + 4), 0) + i * TH - 4
    cols = jax.lax.broadcasted_iota(jnp.int32, (TH + 8, 1, W + 4), 2) - 2
    xs_ref[:] = jnp.where((rows >= r0) & (rows < vh) & (cols < vw),
                          xs_ref[:], 0.0)

    # ---- assemble dy pooled rows [i*HB-1, i*HB+HB+1) → (HB+2, 64, WB) ---
    # dy arrives row-major (B, H/2, 64, W/2): the pooled-row dim must sit
    # OUTSIDE the block's trailing two dims (Mosaic requires those to be
    # (8,128)-divisible or full — HB=4 rows is neither)
    dy_ref[1:HB + 1] = dyc_ref[0]
    dy_ref[0:1] = dyp_ref[0, HB - 1:HB, :, :]
    dy_ref[HB + 1:HB + 2] = dyn_ref[0, 0:1, :, :]

    @pl.when(i == 0)
    def _():
        dy_ref[0:1] = jnp.zeros((1, 64, WB), jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        dy_ref[HB + 1:HB + 2] = jnp.zeros((1, 64, WB), jnp.float32)

    qrows = jax.lax.broadcasted_iota(
        jnp.int32, (HB + 2, 1, WB), 0) + i * HB - 1
    qcols = jax.lax.broadcasted_iota(jnp.int32, (HB + 2, 1, WB), 2)
    dy_ref[:] = jnp.where(
        (qrows * 2 >= r0) & (qrows >= 0) & (qrows * 2 < vh) &
        (qcols * 2 < vw), dy_ref[:], 0.0)

    # ---- recompute c1 rows global [i*TH-3, i*TH+TH+3) (c1 offset = g -
    # (i*TH-3)); xs offset of global row g-1 is (g-1)-(i*TH-4) = r1 ----
    c1_cols = jax.lax.broadcasted_iota(jnp.int32, (64, W + 2), 1) - 1
    xcol_ref[27:32] = jnp.zeros((5, W + 2), jnp.float32)

    def row1(r1, _):
        for t in range(9):
            dy_, dx_ = t // 3, t % 3
            xcol_ref[t * 3:t * 3 + 3] = \
                xs_ref[r1 + dy_, :, dx_:dx_ + W + 2]
        acc = jax.lax.dot(
            w1_ref[:].astype(jnp.bfloat16),
            xcol_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        act = jnp.maximum(acc + b1_ref[:], 0.0)
        grow = i * TH - 3 + r1
        inside = (grow >= r0) & (grow < vh) & (c1_cols >= 0) & \
            (c1_cols < vw)
        c1_ref[r1] = jnp.where(inside, act, 0.0)
        return 0

    jax.lax.fori_loop(0, TH + 6, row1, 0)

    # ---- pool/relu backward: dpre2 rows global [i*TH-1, i*TH+TH+1)
    # (dp2 offset = g - (i*TH-1), with a zero column pad on both sides).
    # Per pooled row q: recompute the c2 row pair, find the first maximal
    # window element (row-major), route dy, apply the relu mask. ----
    dp2_ref[:, :, 0:1] = jnp.zeros((TH + 2, 64, 1), jnp.float32)
    dp2_ref[:, :, W + 1:W + 2] = jnp.zeros((TH + 2, 64, 1), jnp.float32)

    def c2_row(g_off):
        """c2 row at global i*TH-2+g_off from c1 offsets g_off..g_off+2
        (c1 offset of global g' - 1 is (g'-1)-(i*TH-3) = g_off where
        g' = i*TH-2+g_off)."""
        acc = jnp.broadcast_to(b2_ref[:], (64, W))
        for t in range(9):
            dy_, dx_ = t // 3, t % 3
            sl = c1_ref[g_off + dy_, :, dx_:dx_ + W]
            acc = acc + jax.lax.dot(
                w2t_ref[t].astype(jnp.bfloat16), sl.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        return jnp.maximum(acc, 0.0)          # masked c1 ⇒ pad cols ≥ vw
                                              # still get relu(b2); dy=0
                                              # there discards them

    def pooled_row(q_loc, _):
        # global pooled row q = i*HB - 1 + q_loc; c2 rows 2q, 2q+1 have
        # c2-row offsets (2q)-(i*TH-2) = 2*q_loc .. +1
        r0 = c2_row(2 * q_loc)                # (64, W)
        r1 = c2_row(2 * q_loc + 1)
        a0 = jnp.transpose(r0, (1, 0)).reshape(WB, 2, 64)
        a1 = jnp.transpose(r1, (1, 0)).reshape(WB, 2, 64)
        v00, v01 = a0[:, 0, :], a0[:, 1, :]
        v10, v11 = a1[:, 0, :], a1[:, 1, :]
        m = jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11))
        e00 = v00 == m
        e01 = (v01 == m) & ~e00
        e10 = (v10 == m) & ~e00 & ~e01
        e11 = (v11 == m) & ~e00 & ~e01 & ~e10
        dyq = jnp.transpose(dy_ref[q_loc], (1, 0))          # (WB, 64)
        # relu backward folds in: activation > 0
        d00 = jnp.where(e00 & (v00 > 0), dyq, 0.0)
        d01 = jnp.where(e01 & (v01 > 0), dyq, 0.0)
        d10 = jnp.where(e10 & (v10 > 0), dyq, 0.0)
        d11 = jnp.where(e11 & (v11 > 0), dyq, 0.0)
        row0 = jnp.stack([d00, d01], axis=1).reshape(WB * 2, 64)
        row1v = jnp.stack([d10, d11], axis=1).reshape(WB * 2, 64)
        # dp2 offset of global 2q is (2q)-(i*TH-1) = 2*q_loc - 1
        o = 2 * q_loc - 1

        @pl.when(o >= 0)
        def _():
            dp2_ref[o, :, 1:W + 1] = jnp.transpose(row0, (1, 0))

        @pl.when(o + 1 < TH + 2)
        def _():
            dp2_ref[o + 1, :, 1:W + 1] = jnp.transpose(row1v, (1, 0))
        return 0

    jax.lax.fori_loop(0, HB + 2, pooled_row, 0)

    # ---- dw2 / db2 from the strip's OWN c2 rows: dp2 offsets 1..TH ----
    def own_row2(o, _):
        d = dp2_ref[o, :, 1:W + 1]                           # (64, W)
        db2_ref[0:1] = db2_ref[0:1] + jnp.sum(d, axis=1)[None, :]
        dT = jnp.transpose(d, (1, 0)).astype(jnp.bfloat16)   # (W, 64)
        # c1 offset of global (g+dy-1) where g = i*TH-1+o:
        # (g+dy-1)-(i*TH-3) = o + dy + 1
        for t in range(9):
            dy_, dx_ = t // 3, t % 3
            sl = c1_ref[o + dy_ + 1, :, dx_:dx_ + W]
            dw2_ref[t * 64:(t + 1) * 64] = dw2_ref[
                t * 64:(t + 1) * 64] + jax.lax.dot(
                sl.astype(jnp.bfloat16), dT,
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(1, TH + 1, own_row2, 0)

    # ---- dc1 rows global [i*TH, i*TH+TH) → dpre1 → dw1 / db1 ----
    def own_row1(r, _):
        # dc1 global g = i*TH + r ← dpre2 rows g-1..g+1 (dp2 offsets
        # (g')-(i*TH-1) = r .. r+2), columns shifted by 1-dx (the zero
        # column pads make the shifts plain slices)
        acc = jnp.zeros((64, W), jnp.float32)
        for t in range(9):
            dy_, dx_ = t // 3, t % 3
            # dc1[g] += w2[dy,dx]^T(ci←co) · dpre2[g+1-dy, cols+1-dx]
            dsl = dp2_ref[r + 2 - dy_, :, 2 - dx_:2 - dx_ + W]
            acc = acc + jax.lax.dot(
                w2_ref[t].astype(jnp.bfloat16), dsl.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        # relu mask from the recomputed c1 (offset of global g is r+3);
        # masked c1 is zero beyond valid ⇒ gradients discarded there too
        dpre1 = jnp.where(c1_ref[r + 3, :, 1:W + 1] > 0, acc, 0.0)
        db1_ref[0:1] = db1_ref[0:1] + jnp.sum(dpre1, axis=1)[None, :]
        dT = jnp.transpose(dpre1, (1, 0)).astype(jnp.bfloat16)  # (W, 64)
        # xs offset of global (g+dy-1) is (g+dy-1)-(i*TH-4) = r+dy+3
        for t in range(9):
            dy_, dx_ = t // 3, t % 3
            sl = xs_ref[r + dy_ + 3, :, dx_ + 1:dx_ + 1 + W]
            dw1_ref[t * 3:t * 3 + 3] = dw1_ref[
                t * 3:t * 3 + 3] + jax.lax.dot(
                sl.astype(jnp.bfloat16), dT,
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, TH, own_row1, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "vma"))
def _stem_grad_call(xcf, dycf, w1col, b1, w2taps_t, w2taps, b2, valid, *,
                    interpret=False, vma=None):
    xcf, dycf, w1col, b1, w2taps_t, w2taps, b2, valid = _pvary(
        vma, xcf, dycf, w1col, b1, w2taps_t, w2taps, b2, valid)
    B, _, H, W = xcf.shape
    grid = (B, H // TH)
    HB = TH // 2
    n_i = H // TH

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TH, W),
                         lambda b, i, s: (b, 0, jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((1, 3, TH, W), lambda b, i, s: (b, 0, i, 0)),
            pl.BlockSpec((1, 3, TH, W),
                         lambda b, i, s: (
                             b, 0, jnp.minimum(i + 1, n_i - 1), 0)),
            pl.BlockSpec((1, HB, 64, W // 2),
                         lambda b, i, s: (b, jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((1, HB, 64, W // 2), lambda b, i, s: (b, i, 0, 0)),
            pl.BlockSpec((1, HB, 64, W // 2),
                         lambda b, i, s: (
                             b, jnp.minimum(i + 1, n_i - 1), 0, 0)),
            pl.BlockSpec((64, 32), lambda b, i, s: (0, 0)),
            pl.BlockSpec((64, 1), lambda b, i, s: (0, 0)),
            pl.BlockSpec((9, 64, 64), lambda b, i, s: (0, 0, 0)),
            pl.BlockSpec((9, 64, 64), lambda b, i, s: (0, 0, 0)),
            pl.BlockSpec((64, 1), lambda b, i, s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((32, 64), lambda b, i, s: (0, 0)),
            pl.BlockSpec((8, 64), lambda b, i, s: (0, 0)),
            pl.BlockSpec((9 * 64, 64), lambda b, i, s: (0, 0)),
            pl.BlockSpec((8, 64), lambda b, i, s: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TH + 8, 3, W + 4), jnp.float32),
            pltpu.VMEM((TH + 6, 64, W + 2), jnp.float32),
            pltpu.VMEM((TH // 2 + 2, 64, W // 2), jnp.float32),
            pltpu.VMEM((TH + 2, 64, W + 2), jnp.float32),
            pltpu.VMEM((32, W + 2), jnp.float32),
        ],
    )
    fvma = frozenset(vma) if vma else None
    dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_grad_kernel, H=H, W=W),
        out_shape=[
            jax.ShapeDtypeStruct((32, 64), jnp.float32, vma=fvma),
            jax.ShapeDtypeStruct((8, 64), jnp.float32, vma=fvma),
            jax.ShapeDtypeStruct((9 * 64, 64), jnp.float32, vma=fvma),
            jax.ShapeDtypeStruct((8, 64), jnp.float32, vma=fvma),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid, xcf, xcf, xcf, dycf, dycf, dycf,
      w1col, b1, w2taps_t, w2taps, b2)
    # kernel layouts → HWIO grads
    dw1_hwio = dw1[:27].reshape(3, 3, 3, 64)
    dw2_hwio = dw2.reshape(3, 3, 64, 64)
    return dw1_hwio, db1[0], dw2_hwio, db2[0]


def _np_float0_like(x):
    import numpy as _np
    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _stem_op(x, w1, b1, w2, b2, valid, interpret, vma):
    xcf = jnp.transpose(x, (0, 3, 1, 2))
    w1col, b1c, w2taps_t, b2c = prep_weights(w1, b1, w2, b2)
    return _stem_call(xcf, w1col, b1c, w2taps_t, b2c, valid,
                      interpret=interpret, vma=vma)


def _stem_op_fwd(x, w1, b1, w2, b2, valid, interpret, vma):
    return (_stem_op(x, w1, b1, w2, b2, valid, interpret, vma),
            (x, w1, b1, w2, b2, valid))


def _stem_op_bwd(interpret, vma, res, dy):
    x, w1, b1, w2, b2, valid = res
    xcf = jnp.transpose(x, (0, 3, 1, 2))
    # (B, H/2, 64, W/2): keep the pooled-row dim leading so the grad
    # kernel's halo blocks stay off the (8,128)-constrained trailing dims
    dycf = jnp.transpose(dy, (0, 1, 3, 2))
    w1col, b1c, w2taps_t, b2c = prep_weights(w1, b1, w2, b2)
    w2taps = jnp.reshape(w2, (9, 64, 64))            # (ci, co) per tap
    dw1, db1, dw2, db2 = _stem_grad_call(
        xcf, dycf, w1col, b1c, w2taps_t, w2taps, b2c, valid,
        interpret=interpret, vma=vma)
    # the image carries no gradient in this detector (conv1_1 reads the
    # input); a symbolic-zero would be nicer but custom_vjp wants arrays
    return (jnp.zeros_like(x), dw1, db1, dw2, db2,
            _np_float0_like(valid))


_stem_op.defvjp(_stem_op_fwd, _stem_op_bwd)
