"""Native C++ host kernels must agree exactly with the numpy oracles."""

import numpy as np
import pytest

from smallhardface_tpu.ops import native, nms_np, bbox_np


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def _rand_dets(rng, n, span=120):
    dets = np.zeros((n, 5))
    dets[:, :2] = rng.uniform(0, span, (n, 2))
    dets[:, 2:4] = dets[:, :2] + rng.uniform(5, span / 2, (n, 2))
    dets[:, 4] = rng.permutation(n) / n + rng.uniform(0, 1e-6, n)
    return dets


def test_native_nms_matches_numpy(lib, rng):
    for n in (0, 1, 7, 120, 500):
        dets = _rand_dets(rng, n)
        assert native.nms(dets, 0.4) == nms_np.nms(dets, 0.4)


def test_native_vote_matches_numpy(lib, rng):
    for n in (0, 1, 5, 100, 400):
        dets = _rand_dets(rng, n)
        got = native.bbox_vote(dets, 0.4)
        want = nms_np.bbox_vote(dets, 0.4)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_overlaps_matches_numpy(lib, rng):
    boxes = _rand_dets(rng, 60)[:, :4]
    query = _rand_dets(rng, 17)[:, :4]
    np.testing.assert_allclose(
        native.bbox_overlaps(boxes, query),
        bbox_np.bbox_overlaps(boxes, query), rtol=1e-14)


def test_native_vote_speed(lib, rng):
    """The native path should beat numpy comfortably on large inputs."""
    import time
    dets = _rand_dets(rng, 4000, span=2000)
    t0 = time.perf_counter()
    native.bbox_vote(dets, 0.4)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    nms_np.bbox_vote(dets, 0.4)
    t_np = time.perf_counter() - t0
    assert t_native < t_np, (t_native, t_np)
