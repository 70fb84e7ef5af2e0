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
        # route the in-forward call through the interpreter
        orig = ps.fused_stem
        ps.fused_stem = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        fused = dm.forward(params, jnp.asarray(x), spec,
                           valid_hw=(vh, vw), mask_mode="where",
                           pallas_stem=True)
    finally:
        if INTERP:
            ps.fused_stem = orig
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
        orig = ps.fused_stem
        ps.fused_stem = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        fused = dm.forward(params, x, spec, compute_dtype=jnp.bfloat16,
                           pallas_stem=True)
    finally:
        if INTERP:
            ps.fused_stem = orig
    a, b = np.asarray(fused["cls_logits"]), np.asarray(plain["cls_logits"])
    # both paths carry bf16 activation noise; agreement at the bf16 scale
    np.testing.assert_allclose(a, b, rtol=1e-1,
                               atol=0.05 * np.abs(b).max())
