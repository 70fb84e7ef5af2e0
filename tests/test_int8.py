"""Quantized int8 inference mode (TPU.PRECISION="int8").

The MXU runs int8×int8→int32 at ~2× the bf16 rate (measured 379.8 TOPS
at 16384³, scripts/stem_probe.py; quantized layer chains 1.9–2.4× faster
than fp32 at production shapes, PERF_NOTES round 3). These tests pin the
numerics contract of layers.conv2d_int8 and the mode's guard rails; the
end-to-end drift bound lives in test_full_detect_golden-style form below.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu.models.layers import conv2d, conv2d_int8


def test_conv2d_int8_close_to_fp32():
    """Well-conditioned inputs: the quantized conv tracks fp32 to the
    ~1% per-tensor quantization noise floor."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(1, 16, 24, 32)).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 32, 48).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(48).astype(np.float32) * 0.01)
    want = np.asarray(conv2d(x, w, b, padding=1))
    got = np.asarray(conv2d_int8(x, w, b, padding=1))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() < 0.03 * denom


def test_conv2d_int8_zeros_stay_exact():
    """Exact zeros in and beyond the image must stay exact zeros through
    quantize→conv→dequant (the valid-extent masking discipline)."""
    rng = np.random.RandomState(1)
    x = np.abs(rng.randn(1, 16, 24, 8)).astype(np.float32)
    x[:, 10:] = 0.0
    x[:, :, 18:] = 0.0
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
    out = np.asarray(conv2d_int8(jnp.asarray(x), w, None, padding=1))
    # interior of the zero region (beyond the 1-px halo) is exactly zero
    assert np.all(out[:, 12:, :] == 0.0)
    assert np.all(out[:, :, 20:] == 0.0)


def test_conv2d_int8_dilation_matches():
    """Dilated form (the shared heads run dilation 2/4) stays within the
    quantization noise floor too."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(np.abs(rng.randn(1, 20, 28, 16)).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.1)
    want = np.asarray(conv2d(x, w, None, dilation=2, padding=2))
    got = np.asarray(conv2d_int8(x, w, None, dilation=2, padding=2))
    assert np.abs(got - want).max() < 0.03 * np.abs(want).max()


def test_forward_int8_tracks_fp32():
    """Whole-detector int8 forward correlates with fp32 logits (random
    init is the worst case — see the end-to-end drift test for the
    pipeline-level bound)."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32) * 30)
    f32 = dm.forward(params, x, spec, mask_mode="where")
    q8 = dm.forward(params, x, spec, compute_dtype="int8",
                    mask_mode="where")
    a = np.asarray(f32["cls_logits"]).ravel()
    b = np.asarray(q8["cls_logits"]).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    assert np.abs(np.asarray(q8["bbox_deltas"])).max() < 1e3


def test_forward_int8_rejects_band_masking():
    """Dynamic activation scales are global reduces — bucket garbage in
    band modes would couple into inside-valid values; the forward must
    refuse instead of silently denormalizing."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        dm.forward(params, x, spec, compute_dtype="int8",
                   valid_hw=(48, 96), mask_mode="band_margin")


def test_conv2d_int8_static_matches_dynamic():
    """With s_x set to the tensor's own max/127 and prebaked weights, the
    static path reproduces the dynamic path bit-for-bit (same scales →
    same int8 lattice)."""
    from smallhardface_tpu.models.layers import quantize_weights_int8
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 16, 24, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 32, 48).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(48).astype(np.float32) * 0.01)
    dyn = np.asarray(conv2d_int8(x, w, b, padding=1))
    s_x = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    qw, s_w = quantize_weights_int8(w)
    st = np.asarray(conv2d_int8(x, w, b, padding=1,
                                s_x=s_x, qw=qw, s_w=s_w))
    np.testing.assert_array_equal(dyn, st)


def test_conv2d_int8_chain_link():
    """One chain link (int8 in → int8 out on the successor grid) tracks
    the fp32 conv+bias+relu to the two-sided quantization noise floor,
    and exact-zero carrier rows stay exactly zero (masking discipline
    on the int8 carrier)."""
    from smallhardface_tpu.models.layers import (
        conv2d_int8_chain, quantize_weights_int8)
    rng = np.random.RandomState(8)
    x = np.abs(rng.randn(1, 16, 24, 16)).astype(np.float32)
    x[:, 12:] = 0.0
    w = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32) * 0.01)
    s_in = float(np.abs(x).max()) / 127.0
    q = jnp.asarray(np.clip(np.round(x / s_in), -127, 127).astype(np.int8))
    qw, s_w = quantize_weights_int8(w)
    ref = np.asarray(jax.nn.relu(conv2d(
        jnp.asarray(x), w, b, padding=1)))
    s_out = ref.max() / 127.0
    got_q = conv2d_int8_chain(q, qw, s_in, s_w, b, padding=1,
                              s_out=jnp.float32(s_out))
    assert got_q.dtype == jnp.int8
    got = np.asarray(got_q).astype(np.float32) * s_out
    assert np.abs(got - ref).max() < 0.05 * ref.max()
    # masking discipline: a bias-free link maps the all-zero carrier
    # region (rows >= 12, beyond the 1-px halo at 13) to exact zeros —
    # round(0)=0 end to end on the int8 carrier
    z = conv2d_int8_chain(q, qw, s_in, s_w, None, padding=1,
                          s_out=jnp.float32(s_out))
    assert np.all(np.asarray(z)[:, 13:] == 0)
    # fp32 chain end (s_out=None) matches the reference closely too
    got_f = np.asarray(conv2d_int8_chain(q, qw, s_in, s_w, b, padding=1))
    assert np.abs(got_f - ref).max() < 0.03 * ref.max()


def test_forward_qstate_tracks_fp32():
    """Calibrated static-quant forward (collect_int8_amax → make_qstate →
    qstate) stays correlated with fp32, including on an input the
    calibration never saw (saturating clip, not blow-up)."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(6)
    calib = [rng.randn(1, 64, 128, 3).astype(np.float32) * 30
             for _ in range(2)]
    amax = dm.collect_int8_amax(params, spec, calib)
    assert sorted(amax) == sorted(dm.int8_layer_names(spec))
    assert all(v > 0 for v in amax.values())
    qstate = dm.make_qstate(params, spec, amax)
    # 1.3×: mildly outside the calibrated range
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32) * 39)
    f32 = dm.forward(params, x, spec, mask_mode="where")
    q8 = dm.forward(params, x, spec, compute_dtype="int8",
                    mask_mode="where", qstate=qstate)
    a = np.asarray(f32["cls_logits"]).ravel()
    b = np.asarray(q8["cls_logits"]).ravel()
    assert np.all(np.isfinite(b))
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def test_detector_calibrate_int8():
    """TPUDetector.calibrate_int8 builds a qstate, clears the program
    caches, and subsequent detections run the static path sanely."""
    from smallhardface_tpu.detect import TPUDetector
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    rng = np.random.RandomState(7)
    im = rng.randint(0, 255, (90, 130, 3), dtype=np.uint8)
    saved = (cfg.TPU.PRECISION, cfg.TPU.MASK_MODE, cfg.TEST.SCALES,
             cfg.TEST.FLIP)
    cfg.TEST.SCALES = [60]
    cfg.TEST.FLIP = False
    try:
        cfg.TPU.MASK_MODE = "where"
        cfg.TPU.PRECISION = "float32"
        d32 = TPUDetector(params, spec).detect(im, thresh=0.05)[0][0]
        cfg.TPU.PRECISION = "int8"
        det = TPUDetector(params, spec)
        with pytest.raises(ValueError, match="int8"):
            # guard: calibration only makes sense in int8 mode
            cfg.TPU.PRECISION = "float32"
            TPUDetector(params, spec).calibrate_int8([im])
        cfg.TPU.PRECISION = "int8"
        amax = det.calibrate_int8([im])
        assert det.qstate is not None and len(det._compiled_dev) == 0
        assert sorted(amax) == sorted(dm.int8_layer_names(spec))
        d8 = det.detect(im, thresh=0.05)[0][0]
    finally:
        (cfg.TPU.PRECISION, cfg.TPU.MASK_MODE, cfg.TEST.SCALES,
         cfg.TEST.FLIP) = saved
    assert abs(d8.shape[0] - d32.shape[0]) <= max(5, 0.5 * d32.shape[0])


def test_detector_init_rejects_int8_band():
    """TPUDetector fails fast at construction when int8 is combined with
    the (default) band mask mode, naming both config keys."""
    from smallhardface_tpu.detect import TPUDetector
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    saved = (cfg.TPU.PRECISION, cfg.TPU.MASK_MODE)
    cfg.TPU.PRECISION = "int8"
    cfg.TPU.MASK_MODE = "band"
    try:
        with pytest.raises(ValueError, match="MASK_MODE"):
            TPUDetector(params, spec)
    finally:
        cfg.TPU.PRECISION, cfg.TPU.MASK_MODE = saved


def test_train_rejects_int8():
    from smallhardface_tpu.train import train_loop
    saved = cfg.TPU.PRECISION
    cfg.TPU.PRECISION = "int8"
    try:
        with pytest.raises(ValueError, match="inference-only"):
            train_loop.train_net(None, None, "", 1)
    finally:
        cfg.TPU.PRECISION = saved


def test_detector_int8_mode_wires_through():
    """TPUDetector with PRECISION='int8' + MASK_MODE='where' produces a
    sane detection set close to the fp32 one on a small image."""
    from smallhardface_tpu.detect import TPUDetector
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    rng = np.random.RandomState(5)
    im = rng.randint(0, 255, (90, 130, 3), dtype=np.uint8)
    saved = (cfg.TPU.PRECISION, cfg.TPU.MASK_MODE, cfg.TEST.SCALES,
             cfg.TEST.FLIP)
    cfg.TEST.SCALES = [60]
    cfg.TEST.FLIP = False
    try:
        cfg.TPU.PRECISION = "float32"
        cfg.TPU.MASK_MODE = "where"
        d32 = TPUDetector(params, spec).detect(im, thresh=0.05)[0][0]
        cfg.TPU.PRECISION = "int8"
        d8 = TPUDetector(params, spec).detect(im, thresh=0.05)[0][0]
    finally:
        (cfg.TPU.PRECISION, cfg.TPU.MASK_MODE, cfg.TEST.SCALES,
         cfg.TEST.FLIP) = saved
    # random-init worst case: counts in the same ballpark, geometry of
    # the confident detections overlapping
    assert abs(d8.shape[0] - d32.shape[0]) <= max(5, 0.5 * d32.shape[0])


def test_int8_static_spatial_mesh_matches_single():
    """Calibrated (chained) int8 under a spatial mesh: the int8 carriers,
    cross-shard requantizes, and the f4 lateral dequant all partition
    cleanly — detections match the single-device int8 run to last-ulp
    reassociation."""
    from smallhardface_tpu.detect import TPUDetector
    from smallhardface_tpu.parallel.mesh import make_spatial_mesh
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    rng = np.random.RandomState(8)
    im = rng.randint(0, 255, (60, 90, 3), dtype=np.uint8)
    saved = (cfg.TPU.PRECISION, cfg.TPU.MASK_MODE, cfg.TEST.SCALES,
             cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET)
    cfg.TEST.SCALES = [48]
    cfg.TEST.FLIP = False
    cfg.TPU.TEST_BUCKET = 64      # small compiled programs (1-core box)
    try:
        cfg.TPU.MASK_MODE = "where"
        cfg.TPU.PRECISION = "int8"
        det1 = TPUDetector(params, spec)
        det1.calibrate_int8([im])
        single = det1.detect(im, thresh=0.05)[0][0]
        det_sp = TPUDetector(params, spec, spatial_mesh=make_spatial_mesh(2))
        det_sp.calibrate_int8([im])
        sharded = det_sp.detect(im, thresh=0.05)[0][0]
        assert single.shape == sharded.shape
        np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-3)
    finally:
        (cfg.TPU.PRECISION, cfg.TPU.MASK_MODE, cfg.TEST.SCALES,
         cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET) = saved
