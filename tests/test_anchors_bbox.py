import numpy as np

from smallhardface_tpu.ops.anchors import generate_anchors, dense_anchors
from smallhardface_tpu.ops import bbox_np


def test_generate_anchors_shipped_config():
    # base 16, ratio 1, scales [1,2,4]: square 16/32/64 anchors at ctr 7.5
    # (reference proposal param_str, test_different_dilation_template:695).
    a = generate_anchors(base_size=16, ratios=[1], scales=[1, 2, 4],
                         shifts=[0], strides=[8, 8, 8])
    expected = np.array([
        [0, 0, 15, 15],
        [-8, -8, 23, 23],
        [-24, -24, 39, 39],
    ], dtype=np.float64)
    np.testing.assert_array_equal(a, expected)


def test_generate_anchors_faster_rcnn_default():
    # classic 9-anchor enumeration sanity: shapes and centers
    a = generate_anchors(base_size=16, ratios=[0.5, 1, 2],
                         scales=[8, 16, 32], shifts=[0], strides=[0, 0, 0])
    assert a.shape == (9, 4)
    ws = a[:, 2] - a[:, 0] + 1
    hs = a[:, 3] - a[:, 1] + 1
    # ratio blocks of 3: h/w ≈ ratio
    np.testing.assert_allclose((hs / ws)[:3], 0.5, atol=0.05)
    np.testing.assert_allclose((hs / ws)[3:6], 1.0, atol=0.01)
    np.testing.assert_allclose((hs / ws)[6:], 2.0, atol=0.1)


def test_dense_anchors_layout():
    base = generate_anchors(base_size=16, ratios=[1], scales=[1, 2, 4],
                            shifts=[0], strides=[8, 8, 8])
    d = dense_anchors(2, 3, 8, base)
    assert d.shape == (2 * 3 * 3, 4)
    # rows ordered (h, w, a)
    np.testing.assert_array_equal(d[0], base[0])
    np.testing.assert_array_equal(d[3], base[0] + [8, 0, 8, 0])   # w+1
    np.testing.assert_array_equal(d[9], base[0] + [0, 8, 0, 8])   # h+1


def test_bbox_transform_roundtrip(rng):
    ex = rng.uniform(0, 100, (20, 4))
    ex[:, 2:] = ex[:, :2] + rng.uniform(5, 50, (20, 2))
    gt = rng.uniform(0, 100, (20, 4))
    gt[:, 2:] = gt[:, :2] + rng.uniform(5, 50, (20, 2))
    deltas = bbox_np.bbox_transform(ex, gt)
    rec = bbox_np.bbox_transform_inv(ex, deltas)
    # The reference encode/decode pair is intentionally asymmetric: decoding
    # an encoded box recovers (x1, y1, x2+1, y2+1) — see the compensation at
    # /root/reference/lib/layers/proposal_layer.py:147-151.
    want = gt + np.array([0, 0, 1, 1])
    np.testing.assert_allclose(rec, want, atol=1e-9)


def test_bbox_transform_inv_overflow_clamp():
    boxes = np.array([[0, 0, 15, 15]], dtype=np.float64)
    deltas = np.array([[0, 0, 100.0, 100.0]])
    out = bbox_np.bbox_transform_inv(boxes, deltas)
    # dw>50 clamped to 5: width = exp(5)*16
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, 2] - out[0, 0], np.exp(5) * 16)


def test_overlaps_matches_bruteforce(rng):
    def iou_one(b, q):
        iw = min(b[2], q[2]) - max(b[0], q[0]) + 1
        ih = min(b[3], q[3]) - max(b[1], q[1]) + 1
        if iw <= 0 or ih <= 0:
            return 0.0
        inter = iw * ih
        ba = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
        qa = (q[2] - q[0] + 1) * (q[3] - q[1] + 1)
        return inter / (ba + qa - inter)

    boxes = rng.uniform(0, 80, (15, 4))
    boxes[:, 2:] += boxes[:, :2]
    query = rng.uniform(0, 80, (7, 4))
    query[:, 2:] += query[:, :2]
    got = bbox_np.bbox_overlaps(boxes, query)
    want = np.array([[iou_one(b, q) for q in query] for b in boxes])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_clip_boxes():
    boxes = np.array([[-5.0, -3, 200, 300]])
    out = bbox_np.clip_boxes(boxes, (100, 150))  # (H, W)
    np.testing.assert_array_equal(out, [[0, 0, 149, 99]])


def test_jax_matches_numpy(rng):
    import jax.numpy as jnp
    from smallhardface_tpu.ops import bbox_jax

    ex = rng.uniform(0, 100, (30, 4))
    ex[:, 2:] = ex[:, :2] + rng.uniform(5, 50, (30, 2))
    deltas = rng.randn(30, 4) * 0.5
    np_out = bbox_np.bbox_transform_inv(ex, deltas)
    jx_out = np.asarray(bbox_jax.bbox_transform_inv(
        jnp.asarray(ex), jnp.asarray(deltas)))
    # jax runs float32, the numpy oracle float64
    np.testing.assert_allclose(jx_out, np_out, rtol=1e-4, atol=5e-3)

    gt = rng.uniform(0, 100, (30, 4))
    gt[:, 2:] = gt[:, :2] + rng.uniform(5, 50, (30, 2))
    np.testing.assert_allclose(
        np.asarray(bbox_jax.bbox_transform(jnp.asarray(ex), jnp.asarray(gt))),
        bbox_np.bbox_transform(ex, gt), rtol=5e-4, atol=5e-4)

    iou_np = bbox_np.bbox_overlaps(ex, gt)
    iou_jx = np.asarray(bbox_jax.iou_matrix(jnp.asarray(ex), jnp.asarray(gt)))
    np.testing.assert_allclose(iou_jx, iou_np, rtol=1e-4, atol=1e-5)


def test_max_iou_chunked(rng):
    import jax.numpy as jnp
    from smallhardface_tpu.ops import bbox_jax

    anchors = rng.uniform(0, 200, (500, 4))
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 60, (500, 2))
    g = 37
    gt = np.zeros((64, 4))
    gt[:g, :2] = rng.uniform(0, 200, (g, 2))
    gt[:g, 2:] = gt[:g, :2] + rng.uniform(5, 60, (g, 2))
    mask = np.zeros(64, bool)
    mask[:g] = True

    best, idx = bbox_jax.max_iou_chunked(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(mask), chunk=16)
    full = bbox_np.bbox_overlaps(anchors, gt[:g])
    np.testing.assert_allclose(np.asarray(best), full.max(axis=1),
                               rtol=1e-5, atol=1e-6)
    # argmax must agree wherever the max is unique
    want_idx = full.argmax(axis=1)
    unique = (full == full.max(axis=1, keepdims=True)).sum(axis=1) == 1
    np.testing.assert_array_equal(np.asarray(idx)[unique], want_idx[unique])
