"""Numerics regression guard: the detector forward on a fixed input with
fixed weights must keep producing the same values across refactors.

The golden values are summary statistics (means/extremes of the outputs and
a handful of probed positions) computed at the time the forward was
cross-validated against the torch replica (tests/test_torch_parity.py) —
if this test fails after a model change, the change altered numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from smallhardface_tpu.models import detector as dm


def _fixed_params(spec):
    """Deterministic weights, independent of init_params policy (the golden
    fixture was cross-validated with exactly these: 0.01·N(0,1) everywhere,
    fixed bilinear deconv)."""
    from smallhardface_tpu.models.layers import bilinear_kernel
    shapes = dm.param_shapes(spec)
    params = {}
    keys = jax.random.split(jax.random.PRNGKey(42), len(shapes))
    for key, (name, tree) in zip(keys, sorted(shapes.items())):
        if name == "conv5_256_up":
            params[name] = {"w": jnp.asarray(
                bilinear_kernel(2, spec.lateral_channels), jnp.float32)}
        else:
            params[name] = {
                "w": 0.01 * jax.random.normal(key, tree["w"], jnp.float32),
                "b": jnp.zeros(tree["b"], jnp.float32)}
    return params


def _fixed_forward():
    spec = dm.ModelSpec(different_dilation=True)
    params = _fixed_params(spec)
    rng = np.random.RandomState(42)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32) * 40)
    out = dm.forward(params, x, spec)
    return (np.asarray(out["cls_logits"], dtype=np.float64),
            np.asarray(out["bbox_deltas"], dtype=np.float64))


def test_forward_deterministic():
    a = _fixed_forward()
    b = _fixed_forward()
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_forward_golden_statistics(tmp_path):
    cls, box = _fixed_forward()
    stats = np.array([
        cls.mean(), cls.std(), cls.min(), cls.max(),
        box.mean(), box.std(), box.min(), box.max(),
        cls[0, 3, 5, 1, 0], cls[0, 7, 11, 2, 1],
        box[0, 2, 4, 0, 2], box[0, 6, 10, 1, 3],
    ])
    import os.path as osp
    golden_path = osp.join(osp.dirname(__file__), "golden_forward.npy")
    if not osp.exists(golden_path):
        np.save(golden_path, stats)
        raise AssertionError(
            "golden fixture created on first run; re-run the test")
    golden = np.load(golden_path)
    np.testing.assert_allclose(stats, golden, rtol=2e-4, atol=2e-5)
