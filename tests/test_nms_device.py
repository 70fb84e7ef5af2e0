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


def test_bbox_vote_device_matches_numpy(rng):
    from smallhardface_tpu.ops.nms_jax import bbox_vote_device
    for n in (1, 8, 120):
        dets = _rand_dets(rng, n).astype(np.float32)
        dets = dets[dets[:, 4].argsort()[::-1]]
        want = nms_np.bbox_vote(dets, 0.4)
        out, cnt = bbox_vote_device(jnp.asarray(dets), n, 0.4)
        got = np.asarray(out)[:int(cnt)]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_bbox_vote_device_padding_rows(rng):
    from smallhardface_tpu.ops.nms_jax import bbox_vote_device
    dets = _rand_dets(rng, 40).astype(np.float32)
    dets = dets[dets[:, 4].argsort()[::-1]]
    pad = np.zeros((24, 5), np.float32)
    pad[:, 4] = -np.inf
    padded = np.vstack([dets, pad])
    want = nms_np.bbox_vote(dets, 0.4)
    out, cnt = bbox_vote_device(jnp.asarray(padded), 40, 0.4)
    got = np.asarray(out)[:int(cnt)]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_bbox_vote_device_singleton_quirks():
    """Mid-stream singleton clusters are dropped; a final singleton is
    kept; empty input reports zero clusters (host adds the dummy)."""
    from smallhardface_tpu.ops.nms_jax import bbox_vote_device
    # three boxes: top-scored pair overlaps; a far-away mid-score single
    # between them in score order forces the mid-stream drop
    dets = np.array([
        [10, 10, 50, 50, 0.9],
        [12, 12, 52, 52, 0.8],
        [200, 200, 240, 240, 0.85],
    ], np.float32)
    dets = dets[dets[:, 4].argsort()[::-1]]
    want = nms_np.bbox_vote(dets, 0.4)
    out, cnt = bbox_vote_device(jnp.asarray(dets), 3, 0.4)
    got = np.asarray(out)[:int(cnt)]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)

    # two disjoint boxes: first is a mid-stream singleton (dropped),
    # second exhausts the list (kept)
    dets2 = np.array([
        [10, 10, 30, 30, 0.9],
        [100, 100, 130, 130, 0.5],
    ], np.float32)
    want2 = nms_np.bbox_vote(dets2, 0.4)
    out2, cnt2 = bbox_vote_device(jnp.asarray(dets2), 2, 0.4)
    got2 = np.asarray(out2)[:int(cnt2)]
    np.testing.assert_allclose(got2, want2, rtol=2e-5, atol=2e-4)

    out3, cnt3 = bbox_vote_device(jnp.zeros((8, 5), np.float32), 0, 0.4)
    assert int(cnt3) == 0


def test_detector_device_vote_matches_host(rng):
    """Full pyramid path: TPU.DEVICE_VOTE produces the same detections as
    the reference host vote (and host NMS for NMS_METHOD=NMS)."""
    import jax
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.detect import TPUDetector

    saved = {k: cfg.TPU[k] for k in ("DEVICE_VOTE", "VOTE_CAP")}
    saved_test = {k: cfg.TEST[k] for k in ("SCALES", "MAX_SIZE", "FLIP",
                                           "NMS_METHOD")}
    try:
        cfg.TEST.SCALES = [64]
        cfg.TEST.MAX_SIZE = 128
        cfg.TEST.FLIP = True
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(1), spec)
        im = rng.randint(0, 255, (56, 72, 3)).astype(np.uint8)

        for method in ("BBOX_VOTE", "NMS"):
            cfg.TEST.NMS_METHOD = method
            cfg.TPU.DEVICE_VOTE = False
            host_dets, _ = TPUDetector(params, spec).detect(im, thresh=0.05)
            cfg.TPU.DEVICE_VOTE = True
            # random-init weights put nearly every anchor above the 0.05
            # threshold; the cap must cover them all for exact parity
            cfg.TPU.VOTE_CAP = 2048
            dev_dets, _ = TPUDetector(params, spec).detect(im, thresh=0.05)
            assert dev_dets[0].shape == host_dets[0].shape, method
            np.testing.assert_allclose(
                dev_dets[0], host_dets[0], rtol=2e-4, atol=3e-3,
                err_msg=f"method={method}")
    finally:
        cfg.TPU.update(saved)
        cfg.TEST.update(saved_test)
