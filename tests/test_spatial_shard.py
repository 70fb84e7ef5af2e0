"""Spatial (H-axis) sharding of single-image inference across the mesh:
XLA SPMD inserts the conv halo exchanges; detections must be identical to
the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu.parallel.mesh import make_spatial_mesh
from smallhardface_tpu.detect import TPUDetector


def test_forward_spatial_sharded_exact():
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    x = np.random.RandomState(0).randn(1, 128, 128, 3).astype(
        np.float32) * 20
    ref = dm.forward(params, jnp.asarray(x), spec)
    mesh = make_spatial_mesh(4)
    xsh = jax.device_put(jnp.asarray(x),
                         NamedSharding(mesh, P(None, "sp")))
    psh = jax.device_put(params, NamedSharding(mesh, P()))
    out = jax.jit(lambda p, x: dm.forward(p, x, spec))(psh, xsh)
    np.testing.assert_allclose(np.asarray(out["cls_logits"]),
                               np.asarray(ref["cls_logits"]), atol=1e-5)


def test_detect_spatial_sharded_matches_single():
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET)
    cfg.TEST.SCALES = [60, 100]
    cfg.TEST.FLIP = True
    cfg.TPU.TEST_BUCKET = 64
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(1), spec)
        im = (np.random.RandomState(2).uniform(0, 255, (120, 160, 3))
              .astype(np.uint8))
        det1 = TPUDetector(params, spec)
        single = det1.detect(im, thresh=0.05)[0][0]

        mesh = make_spatial_mesh(4)
        det2 = TPUDetector(params, spec, spatial_mesh=mesh)
        sharded = det2.detect(im, thresh=0.05)[0][0]

        assert single.shape == sharded.shape
        order1 = np.lexsort(single.T)
        order2 = np.lexsort(sharded.T)
        np.testing.assert_allclose(sharded[order2], single[order1],
                                   rtol=1e-4, atol=1e-3)
    finally:
        cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET = old


def test_spatial_mesh_ignores_pallas_stem_flag():
    """A Pallas custom call cannot be spatially partitioned, so the
    spatial-mesh detector must take the plain XLA stem even when
    TPU.PALLAS_STEM is on — same detections, no crash (the guard lives in
    detect.py's forward calls)."""
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TPU.PALLAS_STEM)
    cfg.TEST.SCALES = [60]
    cfg.TEST.FLIP = False
    cfg.TPU.TEST_BUCKET = 64
    cfg.TPU.PALLAS_STEM = True
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(1), spec)
        im = (np.random.RandomState(3).uniform(0, 255, (96, 128, 3))
              .astype(np.uint8))
        mesh = make_spatial_mesh(4)
        det = TPUDetector(params, spec, spatial_mesh=mesh)
        sharded = det.detect(im, thresh=0.05)[0][0]
        cfg.TPU.PALLAS_STEM = False
        det_off = TPUDetector(params, spec, spatial_mesh=mesh)
        plain = det_off.detect(im, thresh=0.05)[0][0]
        np.testing.assert_array_equal(sharded, plain)
    finally:
        (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
         cfg.TPU.PALLAS_STEM) = old
