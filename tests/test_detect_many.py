"""detect_many: batched same-bucket inference must reproduce the
one-at-a-time path exactly (vmap adds a batch axis to the same program)."""

import numpy as np
import jax
import pytest

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu.detect import TPUDetector


@pytest.fixture
def many_cfg():
    saved = {k: cfg.TEST[k] for k in ("SCALES", "MAX_SIZE", "FLIP")}
    saved_tpu = {k: cfg.TPU[k] for k in ("VOTE_CAP", "TEST_BUCKET")}
    cfg.TEST.SCALES = [48]
    cfg.TEST.MAX_SIZE = 96
    cfg.TEST.FLIP = True
    cfg.TPU.VOTE_CAP = 2048
    cfg.TPU.TEST_BUCKET = 64
    yield
    cfg.TEST.update(saved)
    cfg.TPU.update(saved_tpu)


def test_detect_many_matches_detect(rng, many_cfg):
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    det = TPUDetector(params, spec)
    # two bucket groups: 3 images at one padded size, 2 at another
    ims = ([rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
            for _ in range(3)] +
           [rng.randint(0, 255, (80, 100, 3)).astype(np.uint8)
            for _ in range(2)])
    singles = [det.detect(im, thresh=0.05)[0] for im in ims]
    batched = det.detect_many(ims, thresh=0.05)
    assert len(batched) == len(ims)
    for one, many in zip(singles, batched):
        assert one[0].shape == many[0].shape
        np.testing.assert_allclose(many[0], one[0], rtol=1e-5, atol=1e-4)
    # max_batch chunking (HBM bound on real chips) keeps order + values
    chunked = det.detect_many(ims, thresh=0.05, max_batch=2)
    for one, many in zip(singles, chunked):
        np.testing.assert_allclose(many[0], one[0], rtol=1e-5, atol=1e-4)


def test_detect_many_matches_host_vote_path(rng, many_cfg):
    """Same check through the host-vote path: identical detection COUNTS
    and values within compilation tolerance (vmap recompiles the same ops
    with a batch axis; XLA's refused fusions shift the last float ulps —
    observed max |Δ| ≈ 4e-6 on CPU)."""
    old = cfg.TPU.DEVICE_VOTE
    cfg.TPU.DEVICE_VOTE = False
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(2), spec)
        det = TPUDetector(params, spec)
        ims = [rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
               for _ in range(2)]
        singles = [det.detect(im, thresh=0.05)[0] for im in ims]
        batched = det.detect_many(ims, thresh=0.05)
        for one, many in zip(singles, batched):
            assert many[0].shape == one[0].shape
            np.testing.assert_allclose(many[0], one[0],
                                       rtol=1e-5, atol=1e-4)
    finally:
        cfg.TPU.DEVICE_VOTE = old


def test_detect_many_honors_host_preproc(rng, many_cfg, caplog):
    """Under TPU.HOST_PREPROC detect_many must not silently run the fused
    device path: it falls back to per-image detect() (reference-exact host
    preprocessing) with a one-time warning, and rejects the score_thresh
    override the host path cannot honor (VERDICT r2 weak #3)."""
    old = cfg.TPU.HOST_PREPROC
    cfg.TPU.HOST_PREPROC = True
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(2), spec)
        det = TPUDetector(params, spec)
        assert det.host_preproc
        ims = [rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
               for _ in range(2)]
        import logging
        with caplog.at_level(logging.WARNING, "smallhardface_tpu.detect"):
            batched = det.detect_many(ims, thresh=0.05)
        assert any("HOST_PREPROC" in r.message for r in caplog.records)
        singles = [det.detect(im, thresh=0.05)[0] for im in ims]
        for one, many in zip(singles, batched):
            np.testing.assert_array_equal(many[0], one[0])
        with pytest.raises(ValueError, match="HOST_PREPROC"):
            det.detect_many(ims, thresh=0.05, score_thresh=0.1)
    finally:
        cfg.TPU.HOST_PREPROC = old


def test_level_serial_bit_identical(rng, many_cfg):
    """TPU.LEVEL_SERIAL inserts optimization_barriers between pyramid
    levels, pinning the scheduler's level order (same peak HBM — XLA
    already orders levels memory-minimally — but a 10× faster compile on
    the big batched programs; PERF_NOTES r4). Barriers are identity ops:
    detections must be BIT-identical with the flag on and off, for a
    multi-level pyramid with flip TTA."""
    cfg.TEST.SCALES = [48, 96]
    old_base = cfg.TEST.PYRAMID_BASE_SIZE
    cfg.TEST.PYRAMID_BASE_SIZE = [48, 96]
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    im = rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
    old = cfg.TPU.LEVEL_SERIAL
    outs = {}
    try:
        for serial in (True, False):
            cfg.TPU.LEVEL_SERIAL = serial
            outs[serial] = TPUDetector(params, spec).detect(
                im, thresh=0.05)[0][0]
    finally:
        cfg.TPU.LEVEL_SERIAL = old
        cfg.TEST.PYRAMID_BASE_SIZE = old_base
    assert outs[True].shape[0] > 0
    np.testing.assert_array_equal(outs[True], outs[False])


def test_flip_split_matches_batched(rng, many_cfg):
    """TPU.FLIP_SPLIT_PX: levels at or above the pixel threshold run the
    flip pair as two serial batch-1 forwards instead of one batch-2
    (measured ~25% faster at the big WIDER buckets on the v5e,
    PERF_NOTES r5). Splitting the batch is a program-structure change
    only — per-item conv results agree with the batched program to
    compile tolerance, so detections must match near-bit-exactly, with
    the LEVEL_SERIAL barrier both on and off."""
    cfg.TEST.SCALES = [48, 96]
    old_base = cfg.TEST.PYRAMID_BASE_SIZE
    cfg.TEST.PYRAMID_BASE_SIZE = [48, 96]
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    im = rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
    old_px = cfg.TPU.FLIP_SPLIT_PX
    old_serial = cfg.TPU.LEVEL_SERIAL
    outs = {}
    try:
        for serial in (True, False):
            cfg.TPU.LEVEL_SERIAL = serial
            for px in (1, 10 ** 9):        # 1 = split everywhere
                cfg.TPU.FLIP_SPLIT_PX = px
                outs[(serial, px)] = TPUDetector(params, spec).detect(
                    im, thresh=0.05)[0][0]
    finally:
        cfg.TPU.FLIP_SPLIT_PX = old_px
        cfg.TPU.LEVEL_SERIAL = old_serial
        cfg.TEST.PYRAMID_BASE_SIZE = old_base
    ref = outs[(True, 10 ** 9)]
    assert ref.shape[0] > 0
    for k, v in outs.items():
        assert v.shape == ref.shape, (k, v.shape, ref.shape)
        np.testing.assert_allclose(v, ref, rtol=1e-5, atol=1e-4,
                                   err_msg=str(k))


def test_program_keys_carry_perf_knobs(rng, many_cfg):
    """The fused-program cache key must include every cfg knob the built
    program bakes in — changing TPU.DECODE_FAST_K / FLIP_SPLIT_PX /
    LEVEL_SERIAL mid-process must produce a different key (r5 review:
    DECODE_FAST_K was missing, so retuning it silently reused the stale
    program)."""
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    det = TPUDetector(params, spec)
    im = rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
    saved = {k: cfg.TPU[k] for k in
             ("DECODE_FAST_K", "FLIP_SPLIT_PX", "LEVEL_SERIAL")}
    try:
        keys = set()
        for amend in ({}, {"DECODE_FAST_K": 7},
                      {"FLIP_SPLIT_PX": 123},
                      {"LEVEL_SERIAL": not cfg.TPU.LEVEL_SERIAL}):
            cfg.TPU.update(saved)
            cfg.TPU.update(amend)
            keys.add(det._prep(im)["key"])
        assert len(keys) == 4, keys
    finally:
        cfg.TPU.update(saved)


def test_build_run_truncation_hook(rng, many_cfg):
    """tools/pyramid_time.py's instrument: truncated variants of the fused
    program compile and execute; the default (_truncate=None) is the
    production program (covered by the golden tests) and the truncated
    returns are scalar checksums with count 0."""
    import jax.numpy as jnp
    spec = dm.ModelSpec(different_dilation=True)
    params = dm.init_params(jax.random.PRNGKey(2), spec)
    det = TPUDetector(params, spec)
    im = rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
    p = det._prep(im)
    key = p["key"]
    level_buckets, flip, vote_method = key[2], key[3], key[4]
    fargs = (det.params, det.qstate, jnp.asarray(p["padded"]),
             jnp.asarray(p["inv_fx"]), jnp.asarray(p["h_s"]),
             jnp.asarray(p["w_s"]), jnp.asarray(p["vh"]),
             jnp.asarray(p["vw"]), jnp.float32(cfg.TEST.SCORE_THRESH),
             jnp.float32(0.05), jnp.float32(cfg.TEST.NMS_THRESH))
    for st in ("preproc", "forward", "decode"):
        out, n = jax.jit(det._build_run(level_buckets, flip, vote_method,
                                        _truncate=st))(*fargs)
        assert out.shape == (1, 1) and int(n) == 0
        assert np.isfinite(np.asarray(out)).all(), st
    # prefix bisection form: fewer levels, same stacked scalar inputs
    out, n = jax.jit(det._build_run(level_buckets[:1], flip, vote_method,
                                    _truncate="forward"))(*fargs)
    assert out.shape == (1, 1) and int(n) == 0
    # the untruncated build still matches the production detect() output
    full, cnt = jax.jit(det._build_run(level_buckets, flip,
                                       vote_method))(*fargs)
    ref = det.detect(im, thresh=0.05)[0][0]
    got = np.asarray(full)[:int(cnt)]
    got = got[np.asarray(got[:, 4] > 0.05)]
    assert got.shape[0] == ref.shape[0]
