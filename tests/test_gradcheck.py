"""Finite-difference gradient checks — the reference framework's core
test oracle (GradientChecker, caffe/include/caffe/test/
test_gradient_check_util.hpp:19-228: analytic vs numeric gradients per
layer) replicated with jax.test_util.check_grads (randomized directional
finite differences vs the AD gradient).

Inputs are chosen away from the piecewise boundaries (relu kinks, the
smooth-L1 knee, pool argmax ties) so the finite-difference step never
straddles a non-differentiable point — the same discipline as the
reference's stepsize/threshold tuning per layer test.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from smallhardface_tpu.models import layers
from smallhardface_tpu.train import losses

# float32 finite differences: loose-ish but honest defaults (the
# reference used stepsize 1e-2, threshold 1e-2/1e-3 for float)
KW = dict(order=1, modes=["rev"], atol=2e-2, rtol=2e-2, eps=1e-3)


def _away_from(x, boundary, margin):
    """Push values at least `margin` away from `boundary` so an eps-step
    finite difference cannot cross it."""
    d = x - boundary
    return boundary + np.where(np.abs(d) < margin,
                               np.sign(d + (d == 0)) * margin, d)


def test_grad_conv2d_dilated():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)
    check_grads(lambda x, w, b: layers.conv2d(
        x, w, b, dilation=2, padding=2).sum(), (x, w, b), **KW)


def test_grad_max_pool_ceil():
    rng = np.random.RandomState(1)
    # distinct values (spread >> eps) so the argmax never flips under FD
    x = rng.permutation(7 * 9 * 2).reshape(1, 7, 9, 2).astype(np.float32)
    x = jnp.asarray(x * 0.1)
    check_grads(lambda x: layers.max_pool_2x2(x).sum(), (x,), **KW)


def test_grad_upsample_bilinear():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 5, 6, 4).astype(np.float32))
    w = jnp.asarray(layers.bilinear_kernel(2, 4))
    check_grads(lambda x: layers.upsample2x_bilinear(x, w).sum(),
                (x,), **KW)


def test_grad_normalize_l2():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32) + 0.5)
    s = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    for across in (True, False):
        check_grads(lambda x, s: layers.normalize_l2(
            x, s, across_spatial=across).sum(), (x, s), **KW)


def test_grad_smooth_l1_both_branches():
    """Cover the quadratic (|d| < 1/sigma^2) and linear branches, with
    inputs pushed off the knee so the FD step stays on one side."""
    rng = np.random.RandomState(4)
    knee = 1.0 / 9.0
    d = rng.randn(20, 4).astype(np.float32)      # mixed branches
    d = _away_from(d, knee, 0.02)
    d = _away_from(d, -knee, 0.02)
    d = _away_from(d, 0.0, 0.02)                 # |d| kink of the linear arm
    t = rng.randn(20, 4).astype(np.float32)
    iw = (rng.rand(20, 4) > 0.3).astype(np.float32)
    ow = rng.rand(20, 4).astype(np.float32)
    pred = jnp.asarray(t + d)
    check_grads(lambda p: losses.smooth_l1(
        p, jnp.asarray(t), jnp.asarray(iw), jnp.asarray(ow)), (pred,), **KW)


def test_grad_softmax_ce_ignore():
    """Ignored (-1) anchors contribute exactly zero gradient; valid ones
    match finite differences."""
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(30, 2).astype(np.float32))
    labels = jnp.asarray(
        rng.choice([-1.0, 0.0, 1.0], size=30).astype(np.float32))
    check_grads(lambda l: losses.softmax_ce_with_ignore(l, labels),
                (logits,), **KW)
    g = jax.grad(lambda l: losses.softmax_ce_with_ignore(l, labels))(logits)
    ignored = np.asarray(labels) < 0
    np.testing.assert_array_equal(np.asarray(g)[ignored], 0.0)


def test_grad_full_detector_forward():
    """Whole-model gradient wrt every param leaf at a tiny resolution —
    the analog of the reference's per-layer sweep composed end-to-end
    (shared dilated head included: one leaf feeds three convs, so its
    gradient sums three paths)."""
    from smallhardface_tpu.models import detector as dm
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 5)

    def scalar(params):
        out = dm.forward(params, x, spec)
        return (out["cls_logits"].sum()
                + jnp.tanh(out["bbox_deltas"]).sum())

    # one random direction through the full pytree is enough here — the
    # per-layer tests above cover the op-level math; this pins the wiring
    check_grads(scalar, (params,), order=1, modes=["rev"],
                atol=5e-2, rtol=5e-2, eps=1e-3)
