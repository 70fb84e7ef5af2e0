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


def test_spatial_mesh_uses_pallas_stem():
    """The spatial-mesh detector routes the stem through
    fused_stem_spatial (shard_map + explicit halo exchange — the SPMD
    partitioner cannot split a Pallas custom call) whenever the level
    bucket's H divides n·8: detections match the XLA-stem spatial path
    to the kernel's bf16-dot rounding."""
    import smallhardface_tpu.ops.pallas_stem as ps
    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TPU.PALLAS_STEM)
    cfg.TEST.SCALES = [60]
    cfg.TEST.FLIP = False
    cfg.TPU.TEST_BUCKET = 64
    cfg.TPU.PALLAS_STEM = True
    ps.TESTING_INTERPRET = True    # interpret kernels + open the TPU gate
    called = []
    orig_sp = ps.fused_stem_spatial
    ps.fused_stem_spatial = lambda *a, **k: called.append(1) or orig_sp(*a, **k)
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(1), spec)
        im = (np.random.RandomState(3).uniform(0, 255, (96, 128, 3))
              .astype(np.uint8))
        mesh = make_spatial_mesh(4)
        det = TPUDetector(params, spec, spatial_mesh=mesh)
        sharded = det.detect(im, thresh=0.05)[0][0]
        assert called, "spatial path did not route through the kernel"
        cfg.TPU.PALLAS_STEM = False
        det_off = TPUDetector(params, spec, spatial_mesh=mesh)
        plain = det_off.detect(im, thresh=0.05)[0][0]
        assert sharded.shape[0] == plain.shape[0]
        # the two stems round differently (bf16 dots vs CPU fp32), so
        # nearly-tied rows lexsort into different orders; match each row
        # to its nearest counterpart instead
        taken = np.zeros(len(plain), bool)
        for row in sharded:
            d = np.abs(plain - row).max(axis=1)
            d[taken] = np.inf
            j = int(np.argmin(d))
            assert d[j] < 0.1, (row, plain[j], d[j])
            taken[j] = True
    finally:
        ps.TESTING_INTERPRET = False
        ps.fused_stem_spatial = orig_sp
        (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
         cfg.TPU.PALLAS_STEM) = old


def test_spatial_mesh_rejects_host_preproc():
    """The host-preproc parity path has no sharded program; combining it
    with a spatial mesh must fail loudly at construction instead of
    silently running unsharded."""
    old = cfg.TPU.HOST_PREPROC
    cfg.TPU.HOST_PREPROC = True
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(0), spec)
        with pytest.raises(ValueError, match="HOST_PREPROC"):
            TPUDetector(params, spec, spatial_mesh=make_spatial_mesh(4))
    finally:
        cfg.TPU.HOST_PREPROC = old
