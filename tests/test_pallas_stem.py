"""Fused Pallas stem (ops/pallas_stem.py) vs the plain op composition.

CPU tests run the kernel in interpret mode. The kernel's contract:
bit-level parity (to bf16-dot rounding) with
pool(relu(conv(relu(conv(x)))))) under the exact valid-extent masking
discipline detector.forward implements (halo exactly zero before every
conv) — including bucket-padded inputs with garbage beyond valid.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smallhardface_tpu.ops.pallas_stem import fused_stem
from smallhardface_tpu.models.layers import conv2d, max_pool_2x2
from smallhardface_tpu.models import detector as dm

INTERP = jax.default_backend() != "tpu"


@pytest.fixture
def stem_weights():
    rng = np.random.RandomState(7)
    return (jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(64).astype(np.float32) * 0.5),
            jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(64).astype(np.float32) * 0.5))


def _plain(x, w1, b1, w2, b2):
    h = jax.nn.relu(conv2d(x, w1, b1, padding=1))
    h = jax.nn.relu(conv2d(h, w2, b2, padding=1))
    return max_pool_2x2(h)


def test_full_extent_parity(stem_weights):
    w1, b1, w2, b2 = stem_weights
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 128, 3).astype(np.float32) * 10)
    got = np.asarray(fused_stem(x, w1, b1, w2, b2, interpret=INTERP))
    want = np.asarray(_plain(x, w1, b1, w2, b2))
    assert got.shape == want.shape == (2, 16, 64, 64)
    # off-TPU the reference convs run true fp32 while the kernel uses
    # bf16 MXU-style passes (on-chip both use bf16: measured max rel
    # 2.2e-5 between them) — tolerance scales with the activations
    np.testing.assert_allclose(got, want, rtol=2e-2,
                               atol=0.01 * np.abs(want).max())


def test_bucket_padded_masking_parity(stem_weights):
    """The kernel on a garbage-padded bucket must equal the plain stem on
    the unpadded valid image — the same exact-boundary contract
    detector.forward's band/where masking provides."""
    w1, b1, w2, b2 = stem_weights
    rng = np.random.RandomState(1)
    vh, vw = 48, 96
    x = rng.randn(2, 64, 128, 3).astype(np.float32) * 10
    got = np.asarray(fused_stem(
        jnp.asarray(x), w1, b1, w2, b2, valid_hw=(vh, vw),
        interpret=INTERP))[:, :vh // 2, :vw // 2]
    want = np.asarray(_plain(jnp.asarray(x[:, :vh, :vw]), w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, rtol=2e-2,
                               atol=0.01 * np.abs(want).max())
    # and the beyond-valid region must be fully independent of the
    # garbage padding: same bucket, different garbage → same output
    x2 = x.copy()
    x2[:, vh:] = 123.0
    x2[:, :, vw:] = -55.0
    got2 = np.asarray(fused_stem(
        jnp.asarray(x2), w1, b1, w2, b2, valid_hw=(vh, vw),
        interpret=INTERP))[:, :vh // 2, :vw // 2]
    np.testing.assert_array_equal(got2, got)


def test_vmap_batched_matches_singles(stem_weights):
    """detect_many's batched program vmaps the whole pyramid run — the
    kernel must produce identical values under vmap."""
    w1, b1, w2, b2 = stem_weights
    rng = np.random.RandomState(2)
    xb = jnp.asarray(rng.randn(3, 2, 32, 128, 3).astype(np.float32))
    out = jax.vmap(lambda x: fused_stem(
        x, w1, b1, w2, b2, valid_hw=(24, 96), interpret=INTERP))(xb)
    for k in range(3):
        single = fused_stem(xb[k], w1, b1, w2, b2, valid_hw=(24, 96),
                            interpret=INTERP)
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(single))


def test_forward_wiring_equivalence():
    """detector.forward(pallas_stem=True) equals the plain forward inside
    the valid extent (the stem's ~2e-5 relative difference amplifies
    mildly through the remaining 13 convs)."""
    if INTERP:
        # the interpreted kernel inside the full jitted forward is slow
        # but correct; keep the shape small
        pass
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    rng = np.random.RandomState(4)
    vh, vw = 32, 112
    x = np.zeros((1, 32, 128, 3), np.float32)
    x[:, :vh, :vw] = rng.randn(1, vh, vw, 3).astype(np.float32) * 30

    import smallhardface_tpu.ops.pallas_stem as ps
    plain = dm.forward(params, jnp.asarray(x), spec,
                       valid_hw=(vh, vw), mask_mode="where")
    if INTERP:
        # route the in-forward call through the interpreter (also opens
        # detector.forward's TPU backend gate)
        ps.TESTING_INTERPRET = True
    try:
        fused = dm.forward(params, jnp.asarray(x), spec,
                           valid_hw=(vh, vw), mask_mode="where",
                           pallas_stem=True)
    finally:
        if INTERP:
            ps.TESTING_INTERPRET = False
    gh, gw = vh // 8, vw // 8
    np.testing.assert_allclose(
        np.asarray(fused["cls_logits"])[:, :gh, :gw],
        np.asarray(plain["cls_logits"])[:, :gh, :gw],
        rtol=5e-2, atol=5e-3)
    # ineligible shapes (W % 128 != 0) silently fall back to the plain
    # stem — identical results
    x2 = jnp.asarray(rng.randn(1, 32, 80, 3).astype(np.float32))
    a = dm.forward(params, x2, spec, pallas_stem=True)
    b = dm.forward(params, x2, spec)
    np.testing.assert_array_equal(np.asarray(a["cls_logits"]),
                                  np.asarray(b["cls_logits"]))


def test_flagship_config_enables_and_keys_the_kernel():
    """The flagship config turns TPU.PALLAS_STEM on, and the detector's
    compiled-program cache keys include the flag (the round-2 S2D lesson:
    a config change that isn't in the key silently reuses stale
    programs)."""
    import tomllib
    import os
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.detect import TPUDetector

    conf = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "smallhardface_tpu", "configs",
        "smallhardface.toml")
    with open(conf, "rb") as f:
        assert tomllib.load(f)["TPU"]["PALLAS_STEM"] is True

    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    det = TPUDetector(params, spec)
    im = np.zeros((40, 56, 3), np.uint8)
    old = cfg.TPU.PALLAS_STEM
    try:
        cfg.TPU.PALLAS_STEM = False
        key_off = det._prep(im)["key"]
        cfg.TPU.PALLAS_STEM = True
        key_on = det._prep(im)["key"]
    finally:
        cfg.TPU.PALLAS_STEM = old
    assert key_on != key_off, "PALLAS_STEM missing from the program key"


def _msk(h, vh_, vw_):
    ys = jax.lax.broadcasted_iota(jnp.int32, h.shape[1:3], 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, h.shape[1:3], 1)
    m = ((ys < vh_) & (xs < vw_))[None, :, :, None]
    return jnp.where(m, h, 0.0)


def _losses(x, dy, vh, vw):
    """(plain XLA loss fn, fused-kernel loss fn) over the where-masked
    stem chain — the exact composition the training forward runs."""
    def plain_loss(params):
        w1_, b1_, w2_, b2_ = params
        h = _msk(x, vh, vw)
        h = _msk(jax.nn.relu(conv2d(h, w1_, b1_, padding=1)), vh, vw)
        h = _msk(jax.nn.relu(conv2d(h, w2_, b2_, padding=1)), vh, vw)
        p = _msk(max_pool_2x2(h), vh // 2, vw // 2)
        return jnp.sum(p * dy)

    def fused_loss(params):
        w1_, b1_, w2_, b2_ = params
        p = fused_stem(x, w1_, b1_, w2_, b2_, valid_hw=(vh, vw),
                       interpret=INTERP)
        return jnp.sum(_msk(p, vh // 2, vw // 2) * dy)

    return plain_loss, fused_loss


def test_grad_exact_arithmetic_parity():
    """The fused backward kernel (custom VJP) vs jax.grad of the XLA
    composition, with small-integer inputs so every bf16 product and f32
    accumulation is EXACT: any nonzero difference is an indexing bug, not
    rounding. Covers pool tie-routing too (integer ties are common)."""
    rng = np.random.RandomState(7)
    w1 = jnp.asarray(rng.randint(-3, 4, (3, 3, 3, 64)).astype(np.float32))
    b1 = jnp.asarray(rng.randint(-3, 4, (64,)).astype(np.float32))
    w2 = jnp.asarray(rng.randint(-2, 3, (3, 3, 64, 64)).astype(np.float32))
    b2 = jnp.asarray(rng.randint(-3, 4, (64,)).astype(np.float32))
    B, H, W, vh, vw = 2, 32, 128, 24, 96
    x = rng.randint(-3, 4, (B, H, W, 3)).astype(np.float32)
    x[:, vh:] = 7.0              # garbage bucket padding must not leak
    x[:, :, vw:] = -3.0
    dy = jnp.asarray(
        rng.randint(-3, 4, (B, H // 2, W // 2, 64)).astype(np.float32))
    plain_loss, fused_loss = _losses(jnp.asarray(x), dy, vh, vw)
    gp = jax.grad(plain_loss)((w1, b1, w2, b2))
    gf = jax.grad(fused_loss)((w1, b1, w2, b2))
    for name, a, b in zip(["dw1", "db1", "dw2", "db2"], gf, gp):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name)


def test_grad_float_tolerance(stem_weights):
    """Float gradients agree to bf16-rounding scale. Off-TPU the XLA
    reference runs true-fp32 convs while the kernel uses bf16 dots;
    near-zero relu pre-acts can flip, re-routing O(dy·x) contributions —
    the observed ceiling is ~10 % of the peak gradient magnitude
    (on-chip both paths run bf16 MXU passes and agree much closer)."""
    w1, b1, w2, b2 = stem_weights
    rng = np.random.RandomState(0)
    B, H, W, vh, vw = 2, 32, 128, 24, 96
    x = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 10)
    dy = jnp.asarray(
        rng.randn(B, H // 2, W // 2, 64).astype(np.float32))
    plain_loss, fused_loss = _losses(x, dy, vh, vw)
    gp = jax.grad(plain_loss)((w1, b1, w2, b2))
    gf = jax.grad(fused_loss)((w1, b1, w2, b2))
    for name, a, b in zip(["dw1", "db1", "dw2", "db2"], gf, gp):
        a, b = np.asarray(a), np.asarray(b)
        peak = np.abs(b).max()
        assert np.abs(a - b).max() < 0.15 * peak, name


def test_grad_under_shard_map():
    """The training composition: per-device grads inside shard_map summed
    with psum (like train_loop.make_device_grads). Off-TPU the pallas HLO
    interpreter cannot propagate varying-manual-axis types through its
    block extraction (JAX suggests check_vma=False as the workaround), so
    the CPU test disables vma checking; the real-chip path runs with
    check_vma=True + vma annotations (same scheme as ops/pallas_iou.py,
    production-proven in the round-2 schedule run)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.RandomState(9)
    w1 = jnp.asarray(rng.randint(-2, 3, (3, 3, 3, 64)).astype(np.float32))
    b1 = jnp.asarray(rng.randint(-2, 3, (64,)).astype(np.float32))
    w2 = jnp.asarray(rng.randint(-2, 3, (3, 3, 64, 64)).astype(np.float32))
    b2 = jnp.asarray(rng.randint(-2, 3, (64,)).astype(np.float32))
    n_dev = 2
    x = jnp.asarray(
        rng.randint(-2, 3, (n_dev, 16, 128, 3)).astype(np.float32))
    dy = jnp.asarray(
        rng.randint(-2, 3, (n_dev, 8, 64, 64)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("d",))

    def device_grads(params, xs, dys):
        def loss(p):
            out = fused_stem(xs, *p, interpret=INTERP,
                             vma=None if INTERP else ("d",))
            return jnp.sum(out * dys)
        g = jax.grad(loss)(params)
        return jax.tree_util.tree_map(
            lambda t: jax.lax.psum(t, "d"), g)

    sharded = shard_map(
        device_grads, mesh=mesh,
        in_specs=(P(), P("d"), P("d")), out_specs=P(),
        check_vma=not INTERP)
    got = jax.jit(sharded)((w1, b1, w2, b2), x, dy)

    def ref_loss(p):
        h = jax.nn.relu(conv2d(x, p[0], p[1], padding=1))
        h = jax.nn.relu(conv2d(h, p[2], p[3], padding=1))
        return jnp.sum(max_pool_2x2(h) * dy)

    want = jax.grad(ref_loss)((w1, b1, w2, b2))
    for name, a, b in zip(["dw1", "db1", "dw2", "db2"], got, want):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name)


def test_forward_grad_wiring(stem_weights):
    """jax.grad through detector.forward(pallas_stem=True) — the
    TPU.PALLAS_STEM_TRAIN train path — produces grads for EVERY param
    leaf matching the plain forward (stem leaves via the fused backward
    kernel, the rest via XLA's usual VJP)."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(11), spec)
    rng = np.random.RandomState(12)
    vh, vw = 32, 112
    x = np.zeros((1, 32, 128, 3), np.float32)
    x[:, :vh, :vw] = rng.randn(1, vh, vw, 3).astype(np.float32) * 30
    x = jnp.asarray(x)
    gh, gw = vh // 8, vw // 8
    cot = jnp.asarray(rng.randn(1, 4, 16, 3, 2).astype(np.float32))

    def loss(p, use_kernel):
        out = dm.forward(p, x, spec, valid_hw=(vh, vw),
                         mask_mode="where", pallas_stem=use_kernel)
        return jnp.sum(out["cls_logits"][:, :gh, :gw] *
                       cot[:, :gh, :gw])

    import smallhardface_tpu.ops.pallas_stem as ps
    g_plain = jax.grad(loss)(params, False)
    if INTERP:
        ps.TESTING_INTERPRET = True
    try:
        g_fused = jax.grad(loss)(params, True)
    finally:
        if INTERP:
            ps.TESTING_INTERPRET = False

    flat_f = jax.tree_util.tree_leaves_with_path(g_fused)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_plain))
    checked = 0
    for path, leaf in flat_f:
        want = np.asarray(flat_p[path])
        got = np.asarray(leaf)
        peak = np.abs(want).max()
        if peak == 0.0:       # head leaves unused by this cotangent slice
            continue
        # Off-TPU the plain path runs true-fp32 convs while the kernel
        # uses bf16 dots, so EVERY leaf's grad carries forward-pass noise
        # (worst on near-cancelling bias sums). This test checks the
        # wiring (differentiable, every leaf fed, right ballpark); exact
        # indexing parity is test_grad_exact_arithmetic_parity's job.
        assert np.abs(got - want).max() < 0.35 * peak, path
        checked += 1
    assert checked >= 10      # stem + backbone + heads all carry signal


def test_bf16_precision_path_uses_kernel():
    """compute_dtype=bfloat16 also routes through the kernel (fp32 in/out
    with lossless upcast) — without this, bf16 mode would silently lose
    the stem win and run SLOWER than fp32."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(5), spec)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 32, 128, 3).astype(np.float32) * 30)

    import smallhardface_tpu.ops.pallas_stem as ps
    plain = dm.forward(params, x, spec, compute_dtype=jnp.bfloat16)
    if INTERP:
        ps.TESTING_INTERPRET = True
    try:
        fused = dm.forward(params, x, spec, compute_dtype=jnp.bfloat16,
                           pallas_stem=True)
    finally:
        if INTERP:
            ps.TESTING_INTERPRET = False
    a, b = np.asarray(fused["cls_logits"]), np.asarray(plain["cls_logits"])
    # both paths carry bf16 activation noise; agreement at the bf16 scale
    np.testing.assert_allclose(a, b, rtol=1e-1,
                               atol=0.05 * np.abs(b).max())


# ---------------------------------------------------------------------------
# Spatially-sharded stem: shard_map + explicit halo exchange
# ---------------------------------------------------------------------------


def test_spatial_stem_bitexact_full_extent(stem_weights):
    """fused_stem_spatial on a 4-shard H mesh is BIT-identical to the
    unsharded kernel: the per-row dots see the same operands in the same
    order regardless of which strip a row lands in, and the halo exchange
    + valid-row-window masking reproduce the strip-assembly semantics
    exactly."""
    from smallhardface_tpu.ops.pallas_stem import fused_stem_spatial
    from smallhardface_tpu.parallel.mesh import make_spatial_mesh
    w1, b1, w2, b2 = stem_weights
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32) * 10)
    mesh = make_spatial_mesh(4)
    got = np.asarray(fused_stem_spatial(x, w1, b1, w2, b2, mesh=mesh,
                                        interpret=INTERP))
    want = np.asarray(fused_stem(x, w1, b1, w2, b2, interpret=INTERP))
    np.testing.assert_array_equal(got, want)


def test_spatial_stem_bucket_padding(stem_weights):
    """Bucket-padded input (garbage beyond a traced valid extent that
    falls mid-shard): the sharded kernel masks exactly like the unsharded
    one — and both equal the plain composition on pre-zeroed input."""
    from smallhardface_tpu.ops.pallas_stem import fused_stem_spatial
    from smallhardface_tpu.parallel.mesh import make_spatial_mesh
    w1, b1, w2, b2 = stem_weights
    rng = np.random.RandomState(11)
    vh, vw = 40, 200              # row 40 lands inside shard 2 of [0,64)
    x = jnp.asarray(rng.randn(1, 64, 256, 3).astype(np.float32) * 10)
    mesh = make_spatial_mesh(4)
    valid = (jnp.int32(vh), jnp.int32(vw))
    got = np.asarray(fused_stem_spatial(x, w1, b1, w2, b2, mesh=mesh,
                                        valid_hw=valid, interpret=INTERP))
    want = np.asarray(fused_stem(x, w1, b1, w2, b2, valid_hw=valid,
                                 interpret=INTERP))
    np.testing.assert_array_equal(got, want)
    # the true-composition oracle runs on the CROPPED image (the
    # reference's implicit zero padding ends the image at vh/vw); bf16-dot
    # tolerance as in test_bucket_padded_masking_parity
    plain = np.asarray(_plain(jnp.asarray(np.asarray(x)[:, :vh, :vw]),
                              w1, b1, w2, b2))
    np.testing.assert_allclose(got[:, :vh // 2, :vw // 2], plain,
                               rtol=2e-2,
                               atol=0.01 * np.abs(plain).max())


def test_spatial_stem_single_shard_mesh(stem_weights):
    """n=1 degenerates to the plain kernel (zero halos both sides, the
    full valid window) — the edge-shard masking must not clip anything."""
    from smallhardface_tpu.ops.pallas_stem import fused_stem_spatial
    from smallhardface_tpu.parallel.mesh import make_spatial_mesh
    w1, b1, w2, b2 = stem_weights
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 16, 128, 3).astype(np.float32) * 10)
    mesh = make_spatial_mesh(1)
    got = np.asarray(fused_stem_spatial(x, w1, b1, w2, b2, mesh=mesh,
                                        interpret=INTERP))
    want = np.asarray(fused_stem(x, w1, b1, w2, b2, interpret=INTERP))
    np.testing.assert_array_equal(got, want)


def test_spatial_stem_grad_exact_parity():
    """jax.grad through fused_stem_spatial (the spatial-TRAINING stem
    path) vs jax.grad through the unsharded fused_stem, with
    small-integer inputs so every bf16 product and f32 accumulation is
    exact: the per-shard backward kernel + psum must reproduce the
    global backward term-for-term — including the cross-shard-boundary
    dc1 terms (dy rows whose conv1_2 taps reach a neighbor's c1 rows)
    and bucket padding whose valid extent lands mid-shard."""
    from smallhardface_tpu.ops.pallas_stem import fused_stem_spatial
    from smallhardface_tpu.parallel.mesh import make_spatial_mesh

    rng = np.random.RandomState(21)
    w1 = jnp.asarray(rng.randint(-3, 4, (3, 3, 3, 64)).astype(np.float32))
    b1 = jnp.asarray(rng.randint(-3, 4, (64,)).astype(np.float32))
    w2 = jnp.asarray(rng.randint(-2, 3, (3, 3, 64, 64)).astype(np.float32))
    b2 = jnp.asarray(rng.randint(-3, 4, (64,)).astype(np.float32))
    B, H, W = 1, 64, 128
    mesh = make_spatial_mesh(4)
    for vh, vw in ((H, W), (40, 96)):     # full extent + mid-shard valid
        x = rng.randint(-3, 4, (B, H, W, 3)).astype(np.float32)
        x[:, vh:] = 9.0                  # garbage padding must not leak
        x[:, :, vw:] = -4.0
        dy = jnp.asarray(rng.randint(-3, 4, (B, H // 2, W // 2, 64))
                         .astype(np.float32))
        xj = jnp.asarray(x)
        valid = (jnp.int32(vh), jnp.int32(vw))

        def sp_loss(p):
            out = fused_stem_spatial(xj, *p, mesh=mesh, valid_hw=valid,
                                     interpret=INTERP)
            return jnp.sum(out * dy)

        def flat_loss(p):
            out = fused_stem(xj, *p, valid_hw=valid, interpret=INTERP)
            return jnp.sum(out * dy)

        g_sp = jax.jit(jax.grad(sp_loss))((w1, b1, w2, b2))
        g_flat = jax.grad(flat_loss)((w1, b1, w2, b2))
        for name, a, b in zip(["dw1", "db1", "dw2", "db2"], g_sp, g_flat):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} valid={vh, vw}")


def test_flag_falls_back_silently_off_tpu():
    """default.toml contract: 'Engages when fp32 + bucketed shapes ...
    silently falls back otherwise.' On a non-TPU backend the Mosaic
    kernel cannot lower, so with the flag on (the flagship config) and
    no TESTING_INTERPRET escape hatch, detect() must take the XLA chain
    — and produce the XLA path's detections — not crash in lowering."""
    if not INTERP:
        pytest.skip("TPU backend: the kernel genuinely engages")
    import smallhardface_tpu.ops.pallas_stem as ps
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.detect import TPUDetector
    assert ps.TESTING_INTERPRET is False
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TPU.PALLAS_STEM)
    cfg.TEST.SCALES = [60]
    cfg.TEST.FLIP = False
    cfg.TPU.TEST_BUCKET = 64
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(7), spec)
        im = (np.random.RandomState(8).uniform(0, 255, (96, 128, 3))
              .astype(np.uint8))
        cfg.TPU.PALLAS_STEM = True
        with_flag = TPUDetector(params, spec).detect(im, thresh=0.05)[0][0]
        cfg.TPU.PALLAS_STEM = False
        without = TPUDetector(params, spec).detect(im, thresh=0.05)[0][0]
        np.testing.assert_array_equal(with_flag, without)
    finally:
        (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
         cfg.TPU.PALLAS_STEM) = old
