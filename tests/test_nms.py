import numpy as np

from smallhardface_tpu.ops import nms_np


def _rand_dets(rng, n, span=100):
    dets = np.zeros((n, 5))
    dets[:, :2] = rng.uniform(0, span, (n, 2))
    dets[:, 2:4] = dets[:, :2] + rng.uniform(5, span / 2, (n, 2))
    dets[:, 4] = rng.uniform(0, 1, n)
    return dets


def test_nms_simple():
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],     # heavy overlap with first -> suppressed
        [50, 50, 60, 60, 0.7],
    ])
    keep = nms_np.nms(dets, 0.4)
    assert keep == [0, 2]


def test_nms_keeps_all_disjoint(rng):
    dets = np.array([[i * 100, 0, i * 100 + 10, 10, 0.5] for i in range(5)],
                    dtype=np.float64)
    keep = nms_np.nms(dets, 0.3)
    assert sorted(keep) == list(range(5))


def test_nms_bruteforce_equivalence(rng):
    """Greedy NMS against an independent O(N^2) re-derivation."""
    from smallhardface_tpu.ops import bbox_np
    for _ in range(5):
        dets = _rand_dets(rng, 60)
        keep = nms_np.nms(dets, 0.5)
        order = dets[:, 4].argsort()[::-1]
        iou = bbox_np.bbox_overlaps(dets[:, :4], dets[:, :4])
        expected = []
        for i in order:
            if all(iou[i, j] <= 0.5 for j in expected):
                expected.append(int(i))
        assert keep == expected


def test_bbox_vote_empty_returns_dummy():
    out = nms_np.bbox_vote(np.empty((0, 5)), 0.4)
    np.testing.assert_allclose(out, [[10, 10, 20, 20, 0.0001]])


def test_bbox_vote_merges_cluster():
    det = np.array([
        [0, 0, 10, 10, 0.6],
        [1, 1, 11, 11, 0.4],
    ])
    out = nms_np.bbox_vote(det, 0.4)
    assert out.shape == (1, 5)
    w = np.array([0.6, 0.4])
    want = (det[:, :4] * w[:, None]).sum(0) / w.sum()
    np.testing.assert_allclose(out[0, :4], want)
    assert out[0, 4] == 0.6


def test_bbox_vote_drops_midstream_singletons():
    # Reference quirk (/root/reference/lib/test.py:199-206): a singleton
    # cluster is only kept if it is the last one processed.
    det = np.array([
        [0, 0, 10, 10, 0.9],        # singleton, highest -> dropped
        [100, 100, 110, 110, 0.5],  # singleton, last -> kept
    ])
    out = nms_np.bbox_vote(det, 0.4)
    assert out.shape == (1, 5)
    np.testing.assert_allclose(out[0], [100, 100, 110, 110, 0.5])


def test_bbox_vote_single_det_kept():
    det = np.array([[5, 5, 20, 20, 0.7]])
    out = nms_np.bbox_vote(det, 0.4)
    np.testing.assert_allclose(out, det)
