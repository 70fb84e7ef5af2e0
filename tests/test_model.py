import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smallhardface_tpu.models import detector
from smallhardface_tpu.models.layers import (
    bilinear_kernel, upsample2x_bilinear, max_pool_2x2, conv2d,
    conv_s2d_3x3, normalize_l2, permute)


def test_bilinear_kernel_factor2():
    w = bilinear_kernel(2, 1)
    v = np.array([0.25, 0.75, 0.75, 0.25])
    np.testing.assert_allclose(w[:, :, 0, 0], np.outer(v, v))


def test_upsample_doubles_and_interpolates():
    c = 3
    x = jnp.asarray(np.random.RandomState(0).randn(1, 5, 7, c),
                    jnp.float32)
    w = jnp.asarray(bilinear_kernel(2, c))
    y = upsample2x_bilinear(x, w)
    assert y.shape == (1, 10, 14, c)
    # Even output rows/cols interpolate: compare against direct computation
    # of the transposed-conv definition on a constant image.
    ones = jnp.ones((1, 4, 4, 1), jnp.float32)
    yo = upsample2x_bilinear(ones, jnp.asarray(bilinear_kernel(2, 1)))
    # interior of a constant image must stay 1 (partition of unity)
    np.testing.assert_allclose(np.asarray(yo)[0, 2:-2, 2:-2, 0], 1.0,
                               atol=1e-6)


def test_max_pool_ceil_mode():
    x = jnp.arange(5.0 * 6).reshape(1, 5, 6, 1)
    y = max_pool_2x2(x)
    assert y.shape == (1, 3, 3, 1)     # ceil(5/2), ceil(6/2)
    x2 = jnp.arange(4.0 * 4).reshape(1, 4, 4, 1)
    assert max_pool_2x2(x2).shape == (1, 2, 2, 1)


def test_mask_plan_contract():
    """Config-mode mapping: inference 'band' unlocks the margin fast path,
    training keeps 'where' (measured slower otherwise, PERF_NOTES.md);
    unknown modes are rejected rather than silently running the
    margin-requiring path with margin 0."""
    assert detector.mask_plan("band") == ("band_margin", 32)
    assert detector.mask_plan("band_margin") == ("band_margin", 32)
    assert detector.mask_plan("band", train=True) == ("where", 0)
    assert detector.mask_plan("where") == ("where", 0)
    # "exact": shape-exact inference programs, no margin, unmasked
    # forward; training still buckets, so it keeps "where"
    assert detector.mask_plan("exact") == ("exact", 0)
    assert detector.mask_plan("exact", train=True) == ("where", 0)
    with pytest.raises(ValueError):
        detector.mask_plan("bogus")


def test_conv_s2d_3x3_exact_vs_plain_conv():
    """The space-to-depth stem is the SAME dot products regrouped — it
    must reproduce the plain 3x3 SAME conv to float-reassociation noise,
    including the implicit zero-padding halo on all four edges."""
    rng = np.random.RandomState(0)
    for hh, ww, c, co in ((32, 48, 3, 64), (16, 16, 4, 8)):
        x = rng.randn(2, hh, ww, c).astype(np.float32)
        w = rng.randn(3, 3, c, co).astype(np.float32)
        b = rng.randn(co).astype(np.float32)
        want = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), padding=1))
        got = np.asarray(conv_s2d_3x3(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_s2d_stem_matches_plain():
    """forward(s2d_stem=True) must match the plain forward bit-closely,
    masked and unmasked (the stem returns to full-res layout before the
    band discipline resumes)."""
    spec = detector.ModelSpec(different_dilation=True)
    params = detector.init_params(jax.random.PRNGKey(3), spec)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 48, 80, 3).astype(np.float32) * 30

    a = detector.forward(params, jnp.asarray(x), spec)
    b = detector.forward(params, jnp.asarray(x), spec, s2d_stem=True)
    np.testing.assert_allclose(np.asarray(b["cls_logits"]),
                               np.asarray(a["cls_logits"]),
                               rtol=1e-4, atol=1e-4)

    xp = np.zeros((1, 96, 128, 3), np.float32)
    xp[:, :48, :80] = x
    vm = dict(valid_hw=(jnp.int32(48), jnp.int32(80)),
              mask_mode="band_margin")
    a = detector.forward(params, jnp.asarray(xp), spec, **vm)
    b = detector.forward(params, jnp.asarray(xp), spec, s2d_stem=True, **vm)
    np.testing.assert_allclose(
        np.asarray(b["cls_logits"])[:, :6, :10],
        np.asarray(a["cls_logits"])[:, :6, :10], rtol=1e-4, atol=1e-4)


def test_normalize_l2_matches_reference_math():
    """SSD NormalizeLayer semantics (normalize_layer.cpp:85-130): L2 norm
    with eps inside the sqrt, then a shared or per-channel scale."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4, 5).astype(np.float32)

    # across_spatial + channel_shared: one norm per sample, scalar scale
    out = np.asarray(normalize_l2(jnp.asarray(x), jnp.float32(2.0),
                                  across_spatial=True))
    want = np.stack([2.0 * x[n] / np.sqrt((x[n] ** 2).sum() + 1e-10)
                     for n in range(2)])
    np.testing.assert_allclose(out, want, rtol=1e-6)

    # per-position norm across channels, per-channel scale
    sc = np.array([0.5, 1.0, 2.0, 3.0, 4.0], np.float32)
    out = np.asarray(normalize_l2(jnp.asarray(x), jnp.asarray(sc),
                                  across_spatial=False))
    norm = np.sqrt((x ** 2).sum(-1, keepdims=True) + 1e-10)
    np.testing.assert_allclose(out, x / norm * sc, rtol=1e-6)

    # a zero input must not divide by zero (the eps's whole job)
    z = np.asarray(normalize_l2(jnp.zeros((1, 2, 2, 3)), jnp.float32(1.0)))
    assert np.isfinite(z).all() and (z == 0).all()


def test_permute_is_axis_transpose():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 4, 5).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(permute(jnp.asarray(x), (0, 3, 1, 2))),
        x.transpose(0, 3, 1, 2))


def test_conv2d_matches_numpy_direct():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    y = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                          padding=1))
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((1, 6, 6, 4), np.float32)
    for i in range(6):
        for j in range(6):
            patch = xp[0, i:i + 3, j:j + 3, :]
            want[0, i, j] = np.tensordot(patch, w, axes=3) + b
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("different_dilation", [True, False])
def test_detector_shapes(different_dilation):
    spec = detector.ModelSpec(different_dilation=different_dilation)
    params = detector.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 64, 80, 3), jnp.float32)
    out = jax.jit(
        lambda p, x: detector.forward(p, x, spec))(params, x)
    assert out["cls_logits"].shape == (1, 8, 10, 3, 2)
    assert out["bbox_deltas"].shape == (1, 8, 10, 3, 4)


def test_detector_shared_head_param():
    spec = detector.ModelSpec(different_dilation=True)
    shapes = detector.param_shapes(spec)
    assert "head" in shapes and "head_1" not in shapes
    # one 128-ch 3x3 conv over the 128-ch dim-reduced feature
    assert shapes["head"]["w"] == (3, 3, 128, 128)


def test_param_multipliers():
    spec = detector.ModelSpec(different_dilation=True,
                              backbone_lr_mult=2.0, head_lr_mult=1.0)
    lr, decay = detector.param_multipliers(spec)
    assert lr["conv1_1"]["w"] == 0.0 and lr["conv2_2"]["b"] == 0.0
    assert lr["conv3_1"]["w"] == 2.0 and lr["conv3_1"]["b"] == 4.0
    assert decay["conv3_1"]["b"] == 1.0          # caffe default decay_mult
    assert lr["conv4_fuse_final_dim_red"]["w"] == 2.0
    assert lr["head"]["w"] == 1.0 and lr["head"]["b"] == 2.0
    assert decay["head"]["b"] == 0.0
    assert lr["cls_score_2"]["b"] == 2.0 and decay["bbox_pred_4"]["b"] == 0.0
    assert lr["conv5_256_up"]["w"] == 0.0


@pytest.mark.parametrize("mask_mode", ["where", "band", "band_margin"])
@pytest.mark.parametrize("h16,w16,hb,wb", [
    (48, 80, 128, 128),   # generous padding
    (48, 80, 48, 96),     # valid == bucket in H (band slice start clamps)
    (48, 80, 48, 80),     # valid == bucket in both (masking is a no-op)
])
def test_bucket_padding_parity(mask_mode, h16, w16, hb, wb):
    """A bucket-padded input with valid_hw masking must produce exactly the
    same features inside the valid grid as the exact ×16-sized input —
    conv biases otherwise leak relu(bias) activations from the padded
    region into valid cells near the boundary (the reference only ever
    pads to ×16 and sees implicit zeros at every conv). Both mask modes
    ("where" = full-region re-zeroing, "band" = receptive-field band
    zeroing) must agree with the exact forward bit-for-bit inside valid."""
    if mask_mode == "band_margin" and (hb < h16 + 32 or wb < w16 + 32):
        pytest.skip("band_margin requires callers to bucket with a "
                    "32 px margin (detect._prep / assemble_batch do)")
    spec = detector.ModelSpec(different_dilation=True)
    params = detector.init_params(jax.random.PRNGKey(3), spec)
    # pretrained conv biases are nonzero — that's what leaks; random init
    # uses zero biases, so set them explicitly
    keys = jax.random.split(jax.random.PRNGKey(9), len(params))
    for key, (name, leaf) in zip(keys, sorted(params.items())):
        if "b" in leaf:
            leaf["b"] = 0.5 * jax.random.normal(key, leaf["b"].shape)
    rng = np.random.RandomState(0)
    x = rng.randn(1, h16, w16, 3).astype(np.float32) * 30

    exact = detector.forward(params, jnp.asarray(x), spec)

    xp = np.zeros((1, hb, wb, 3), np.float32)
    xp[:, :h16, :w16] = x
    padded = detector.forward(params, jnp.asarray(xp), spec,
                              valid_hw=(jnp.int32(h16), jnp.int32(w16)),
                              mask_mode=mask_mode)

    gh, gw = h16 // 8, w16 // 8
    np.testing.assert_allclose(
        np.asarray(padded["cls_logits"])[:, :gh, :gw],
        np.asarray(exact["cls_logits"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(padded["bbox_deltas"])[:, :gh, :gw],
        np.asarray(exact["bbox_deltas"]), rtol=1e-4, atol=1e-4)

    if hb > h16 or wb > w16:
        # and WITHOUT masking the leak is real (guards against the mask
        # becoming a silent no-op) — padding in EITHER axis leaks
        leaky = detector.forward(params, jnp.asarray(xp), spec)
        diff = np.abs(np.asarray(leaky["cls_logits"])[:, :gh, :gw] -
                      np.asarray(exact["cls_logits"])).max()
        assert diff > 1e-3, "expected boundary leak without masking"


def test_flip_equivariance():
    """Flipping the input AND the conv kernels flips the score map — the
    structural property behind flip TTA (the reference flips the image and
    un-flips the boxes, lib/test.py:147-155; a conv stack is only
    equivariant when the kernels mirror too). Uses even spatial sizes so
    ceil-mode pooling stays symmetric."""
    spec = detector.ModelSpec(different_dilation=True)
    params = detector.init_params(jax.random.PRNGKey(1), spec)
    # mirror every conv kernel along kernel width (HWIO axis 1)
    params_f = {
        name: {k: (v[:, ::-1] if k == "w" and v.ndim == 4 else v)
               for k, v in leaf.items()}
        for name, leaf in params.items()}
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 64, 3))
    out = detector.forward(params, x, spec)
    out_f = detector.forward(params_f, x[:, :, ::-1, :], spec)
    np.testing.assert_allclose(
        np.asarray(out_f["cls_logits"])[:, :, ::-1],
        np.asarray(out["cls_logits"]), rtol=2e-4, atol=2e-4)
