import numpy as np
import jax.numpy as jnp

from smallhardface_tpu.ops import nms_np
from smallhardface_tpu.ops.nms_jax import nms_device


def _rand_dets(rng, n, span=150):
    dets = np.zeros((n, 5))
    dets[:, :2] = rng.uniform(0, span, (n, 2))
    dets[:, 2:4] = dets[:, :2] + rng.uniform(5, span / 2, (n, 2))
    dets[:, 4] = rng.permutation(n) / n + 0.05
    return dets


def test_nms_device_matches_numpy(rng):
    for n in (1, 10, 200):
        dets = _rand_dets(rng, n)
        keep_np = nms_np.nms(dets, 0.5)
        idx, mask, n_keep = nms_device(
            jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 0.5)
        got = np.asarray(idx)[:int(n_keep)]
        assert got.tolist() == keep_np


def test_nms_device_with_padding(rng):
    dets = _rand_dets(rng, 50)
    pad = np.zeros((14, 5))
    pad[:, 4] = -np.inf
    padded = np.vstack([dets, pad])
    keep_np = nms_np.nms(dets, 0.4)
    idx, mask, n_keep = nms_device(
        jnp.asarray(padded[:, :4]), jnp.asarray(padded[:, 4]), 0.4,
        n_valid=50)
    got = np.asarray(idx)[:int(n_keep)]
    assert got.tolist() == keep_np


def test_nms_device_max_out(rng):
    dets = _rand_dets(rng, 100)
    keep_np = nms_np.nms(dets, 0.5)
    idx, mask, n_keep = nms_device(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 0.5, max_out=5)
    got = np.asarray(idx)[:int(n_keep)]
    assert got.tolist() == keep_np[:5]
