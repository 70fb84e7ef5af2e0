import numpy as np
import jax
import jax.numpy as jnp

from smallhardface_tpu.ops import decode, anchors, bbox_np

BASE = anchors.generate_anchors(base_size=16, ratios=[1], scales=[1, 2, 4],
                                shifts=[0], strides=[8, 8, 8])


def _np_proposal_oracle(fg, deltas, im_h, im_w, score_thresh, capacity):
    """Host re-derivation of the reference ProposalLayer TEST path
    (/root/reference/lib/layers/proposal_layer.py:100-190): decode all
    (h, w, a) anchors, clip, threshold with keep-at-least-one, cap."""
    h, w, A = fg.shape
    dense = anchors.dense_anchors(h, w, 8, BASE)
    props = bbox_np.bbox_transform_inv(dense, deltas.reshape(-1, 4))
    props = bbox_np.clip_boxes(props, (im_h, im_w))
    scores = fg.reshape(-1)
    order = np.argsort(-scores, kind="stable")
    above = np.where(scores[order] >= score_thresh)[0]
    n = int(above.max()) + 1 if above.size else 1
    n = min(n, capacity)
    keep = order[:n]
    return props[keep], scores[keep]


def test_decode_matches_numpy_oracle(rng):
    h, w = 6, 9
    fg = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    deltas = (rng.randn(h, w, 3, 4) * 0.3).astype(np.float32)
    im_h, im_w = 8 * h - 3, 8 * w - 5
    cap = 50
    boxes, scores, n = decode.decode_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), BASE, feat_stride=8,
        im_h=float(im_h), im_w=float(im_w), valid_h=h, valid_w=w,
        score_thresh=0.5, min_size=0.0, capacity=cap)
    n = int(n)
    ob, os_ = _np_proposal_oracle(fg.astype(np.float64),
                                  deltas.astype(np.float64),
                                  im_h, im_w, 0.5, cap)
    assert n == len(os_)
    # same score multiset and same boxes (sorted by score)
    np.testing.assert_allclose(np.sort(np.asarray(scores[:n])),
                               np.sort(os_), rtol=1e-5)
    got = np.asarray(boxes[:n])[np.argsort(-np.asarray(scores[:n]))]
    want = ob[np.argsort(-os_, kind="stable")]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


def test_decode_keep_at_least_one(rng):
    h, w = 4, 4
    fg = np.full((h, w, 3), 0.001, np.float32)
    fg[2, 3, 1] = 0.0015   # best, still below thresh
    deltas = np.zeros((h, w, 3, 4), np.float32)
    boxes, scores, n = decode.decode_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), BASE, feat_stride=8,
        im_h=32.0, im_w=32.0, valid_h=h, valid_w=w,
        score_thresh=0.002, min_size=0.0, capacity=10)
    assert int(n) == 1
    np.testing.assert_allclose(float(scores[0]), 0.0015, rtol=1e-5)


def test_decode_bucket_padding_invariant(rng):
    """Extra bucket padding (with garbage scores in the padded region) must
    not change the kept detections."""
    h, w = 5, 7
    fg = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    deltas = (rng.randn(h, w, 3, 4) * 0.2).astype(np.float32)
    kw = dict(feat_stride=8, im_h=37.0, im_w=51.0, valid_h=h, valid_w=w,
              score_thresh=0.4, min_size=0.0, capacity=30)
    b1, s1, n1 = decode.decode_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), BASE, **kw)
    hp, wp = 16, 16
    fgp = rng.uniform(0, 1, (hp, wp, 3)).astype(np.float32)
    fgp[:h, :w] = fg
    dp = (rng.randn(hp, wp, 3, 4)).astype(np.float32)
    dp[:h, :w] = deltas
    b2, s2, n2 = decode.decode_proposals(
        jnp.asarray(fgp), jnp.asarray(dp), BASE, **kw)
    assert int(n1) == int(n2)
    n = int(n1)
    np.testing.assert_allclose(np.asarray(s1[:n]), np.asarray(s2[:n]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b1[:n]), np.asarray(b2[:n]),
                               rtol=1e-6)


def test_decode_cascade_refinement(rng):
    """Cascade deltas apply after the base decode with the -1 x2/y2
    compensation (proposal_layer.py:147-155)."""
    h, w = 3, 4
    fg = rng.uniform(0.4, 1, (h, w, 3)).astype(np.float32)
    d0 = (rng.randn(h, w, 3, 4) * 0.2).astype(np.float32)
    d1 = (rng.randn(h, w, 3, 4) * 0.1).astype(np.float32)
    big = 1e6  # disable clipping effects
    boxes, scores, n = decode.decode_proposals(
        jnp.asarray(fg), jnp.asarray(d0), BASE, feat_stride=8,
        im_h=big, im_w=big, valid_h=h, valid_w=w,
        score_thresh=0.0, min_size=0.0, capacity=h * w * 3,
        refine_deltas=[jnp.asarray(d1)])
    dense = anchors.dense_anchors(h, w, 8, BASE)
    p = bbox_np.bbox_transform_inv(dense.astype(np.float64),
                                   d0.reshape(-1, 4).astype(np.float64))
    p[:, 2:4] -= 1
    p = bbox_np.bbox_transform_inv(p, d1.reshape(-1, 4).astype(np.float64))
    p = bbox_np.clip_boxes(p, (big, big))
    order = np.argsort(-fg.reshape(-1), kind="stable")
    np.testing.assert_allclose(np.asarray(boxes), p[order],
                               rtol=1e-3, atol=1e-2)


def test_decode_subsampled_strides(rng):
    """Per-anchor sub-grid striding keeps anchor k only at positions
    divisible by its stride (proposal_layer.py:160-169)."""
    h, w = 8, 8
    fg = np.full((h, w, 3), 0.9, np.float32)
    deltas = np.zeros((h, w, 3, 4), np.float32)
    boxes, scores, n = decode.decode_proposals(
        jnp.asarray(fg), jnp.asarray(deltas), BASE, feat_stride=8,
        im_h=1e6, im_w=1e6, valid_h=h, valid_w=w,
        score_thresh=0.5, min_size=0.0, capacity=h * w * 3,
        anchor_strides=[1, 2, 4])
    # anchors kept: 64 at stride 1, 16 at stride 2, 4 at stride 4
    assert int(n) == 64 + 16 + 4


def test_decode_batch_fast_k_bitwise_prefix(rng):
    """decode_proposals_batch(fast_k=K) is bitwise-identical to the full
    top-k path on every live row (slot < n_keep), on BOTH cond branches:
    a low-score batch takes the fast top_k(K)+pad branch, a dense batch
    overflows K and falls back to top_k(capacity)."""
    h, w, cap, K = 6, 9, 50, 8
    kw = dict(feat_stride=8, im_h=float(8 * h - 3), im_w=float(8 * w - 5),
              valid_h=h, valid_w=w, score_thresh=0.5, min_size=0.0,
              capacity=cap)
    deltas = (rng.randn(2, h, w, 3, 4) * 0.3).astype(np.float32)

    # fast branch: few above threshold in both items
    fg_sparse = rng.uniform(0, 0.4, (2, h, w, 3)).astype(np.float32)
    fg_sparse[0, 2, 3, 1] = 0.9
    fg_sparse[0, 4, 1, 0] = 0.7
    fg_sparse[1, 1, 5, 2] = 0.8
    # fallback branch: item 1 overflows K above-threshold entries
    fg_dense = rng.uniform(0.6, 1.0, (2, h, w, 3)).astype(np.float32)

    for fg in (fg_sparse, fg_dense):
        ref_b, ref_s, ref_n = decode.decode_proposals_batch(
            jnp.asarray(fg), jnp.asarray(deltas), BASE, fast_k=0, **kw)
        got_b, got_s, got_n = decode.decode_proposals_batch(
            jnp.asarray(fg), jnp.asarray(deltas), BASE, fast_k=K, **kw)
        np.testing.assert_array_equal(np.asarray(ref_n), np.asarray(got_n))
        for i in range(2):
            n = int(ref_n[i])
            np.testing.assert_array_equal(np.asarray(ref_s[i, :n]),
                                          np.asarray(got_s[i, :n]))
            np.testing.assert_array_equal(np.asarray(ref_b[i, :n]),
                                          np.asarray(got_b[i, :n]))
    # sanity on the branch coverage: sparse fits in K, dense overflows
    assert int(jnp.max(decode.decode_proposals_batch(
        jnp.asarray(fg_sparse), jnp.asarray(deltas), BASE,
        fast_k=0, **kw)[2])) <= K
    assert int(jnp.max(decode.decode_proposals_batch(
        jnp.asarray(fg_dense), jnp.asarray(deltas), BASE,
        fast_k=0, **kw)[2])) > K


def test_detect_fast_decode_matches_off():
    """End-to-end: the fused pyramid program with TPU.DECODE_FAST_K
    engaged (high score threshold → the fast branch actually runs)
    produces exactly the detections of the disabled path."""
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.detect import TPUDetector
    from smallhardface_tpu.models import detector as dm

    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
           cfg.TPU.DECODE_FAST_K, cfg.TEST.SCORE_THRESH)
    cfg.TEST.SCALES = [60, 100]
    cfg.TEST.FLIP = True
    cfg.TPU.TEST_BUCKET = 64
    cfg.TEST.SCORE_THRESH = 0.9   # random weights: few anchors above
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(0), spec)
        im = (np.random.RandomState(0).uniform(0, 255, (120, 160, 3))
              .astype(np.uint8))
        dets = {}
        for fast_k in (0, 64, 1):   # off / fast branch / forced fallback
            cfg.TPU.DECODE_FAST_K = fast_k
            det = TPUDetector(params, spec)
            dets[fast_k] = det.detect(im, thresh=0.05)[0][0]
        np.testing.assert_array_equal(dets[0], dets[64])
        np.testing.assert_array_equal(dets[0], dets[1])
    finally:
        (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET,
         cfg.TPU.DECODE_FAST_K, cfg.TEST.SCORE_THRESH) = old


def test_detect_end_to_end_smoke():
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.detect import TPUDetector
    from smallhardface_tpu.models import detector as dm

    old = (cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET)
    cfg.TEST.SCALES = [60, 100]
    cfg.TEST.FLIP = True
    cfg.TPU.TEST_BUCKET = 64
    try:
        spec = dm.ModelSpec(different_dilation=True)
        params = dm.init_params(jax.random.PRNGKey(0), spec)
        det = TPUDetector(params, spec)
        im = (np.random.RandomState(0).uniform(0, 255, (120, 160, 3))
              .astype(np.uint8))
        cls_dets, timers = det.detect(im, thresh=0.05)
        assert len(cls_dets) == 1
        dets = cls_dets[0]
        assert dets.ndim == 2 and dets.shape[1] == 5
        assert np.isfinite(dets).all()
        # determinism
        dets2 = det.detect(im, thresh=0.05)[0][0]
        np.testing.assert_array_equal(dets, dets2)
        # only two compiled programs: one per scale bucket
        assert len(det._compiled) <= 2
    finally:
        cfg.TEST.SCALES, cfg.TEST.FLIP, cfg.TPU.TEST_BUCKET = old


def _np_train_proposal_oracle(fg, deltas, im_h, im_w, min_size,
                              pre_nms_top, post_nms_top, nms_thresh):
    """Literal numpy port of the reference ProposalLayer TRAIN branch
    (/root/reference/lib/layers/proposal_layer.py:100-212, phase==0),
    INCLUDING the upstream quirk: score_thresh is never assigned under
    TRAIN (only TEST sets it, :86-92), so the bare `except` at :180-184
    turns the threshold cut into thresh_idx=0 — keep-top-1 — and the NMS
    + post-NMS cap run on a single box."""
    from smallhardface_tpu.ops import nms_np
    h, w, A = fg.shape
    dense = anchors.dense_anchors(h, w, 8, BASE)
    props = bbox_np.bbox_transform_inv(dense, deltas.reshape(-1, 4))
    props = bbox_np.clip_boxes(props, (im_h, im_w))
    scores = fg.reshape(-1, 1)
    ws = props[:, 2] - props[:, 0] + 1
    hs = props[:, 3] - props[:, 1] + 1
    keep = np.where((ws >= min_size) & (hs >= min_size))[0]
    props, scores = props[keep], scores[keep]
    max_score = scores.ravel()
    order = max_score.argsort()[::-1]
    try:
        score_thresh  # NameError: TRAIN never defines it (:86-92)
        thresh_idx = np.where(max_score[order] >= score_thresh)[0].max()
    except Exception:
        thresh_idx = 0
    if pre_nms_top > 0:
        order = order[:pre_nms_top]
    order = order[:thresh_idx + 1]
    props, scores = props[order], scores[order]
    if len(props):
        keep = nms_np.nms(
            np.hstack([props, scores]).astype(np.float32), nms_thresh)
        if post_nms_top > 0:
            keep = keep[:post_nms_top]
        props, scores = props[keep], scores[keep]
    if props.shape[0] == 0:
        return np.array([[0, 0, 0, 16, 16]], np.float32), np.zeros(0)
    return (np.hstack([np.zeros((len(props), 1)), props]).astype(
        np.float32), scores.ravel())


def test_train_phase_proposals_match_reference_branch(rng):
    """decode_proposals_train == the full numpy port of the TRAIN branch
    (VERDICT r2 missing #5): the effective keep-top-1 contract, min-size
    filtering at the image scale, and the empty→dummy-roi fallback."""
    h, w = 6, 9
    im_h, im_w = 8 * h - 3, 8 * w - 5
    for trial, min_size in [(0, 4.0 * 0.5), (1, 4.0 * 2.0),
                            (2, 1e6)]:          # 1e6: nothing survives
        trng = np.random.RandomState(100 + trial)
        fg = trng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        deltas = (trng.randn(h, w, 3, 4) * 0.3).astype(np.float32)
        want_rois, want_scores = _np_train_proposal_oracle(
            fg.astype(np.float64), deltas.astype(np.float64),
            im_h, im_w, min_size, pre_nms_top=1000, post_nms_top=300,
            nms_thresh=0.7)
        rois, scores, n = decode.decode_proposals_train(
            jnp.asarray(fg), jnp.asarray(deltas), BASE, feat_stride=8,
            im_h=float(im_h), im_w=float(im_w), valid_h=h, valid_w=w,
            min_size=min_size, pre_nms_top=1000, post_nms_top=300,
            nms_thresh=0.7)
        n = int(n)
        if n == 0:
            assert want_scores.size == 0, f"trial {trial}"
            np.testing.assert_array_equal(np.asarray(rois)[0],
                                          [0, 0, 0, 16, 16])
        else:
            assert want_rois.shape[0] == 1, f"trial {trial}"
            np.testing.assert_allclose(np.asarray(rois), want_rois,
                                       rtol=1e-5, atol=1e-4,
                                       err_msg=f"trial {trial}")
            np.testing.assert_allclose(np.asarray(scores)[0],
                                       want_scores[0], rtol=1e-5)


def test_train_phase_proposals_tie_convention():
    """Saturated scores (trained softmax emits exact 1.0 on many anchors)
    tie at the max. The reference's argsort()[::-1] order is UNSPECIFIED
    under ties (numpy's default sort is unstable), so the port pins the
    defined convention a stable ascending argsort reversed yields: the
    LAST maximal keepable index."""
    h, w = 4, 5
    im_h, im_w = 8 * h, 8 * w
    fg = np.full((h, w, 3), 0.25, np.float32)
    # three tied maxima at flat indices 7, 31, 43 (all inside the grid)
    flat = fg.reshape(-1)
    flat[[7, 31, 43]] = 1.0
    deltas = np.zeros((h, w, 3, 4), np.float32)
    rois, scores, n = decode.decode_proposals_train(
        jnp.asarray(fg), jnp.asarray(deltas), BASE, feat_stride=8,
        im_h=float(im_h), im_w=float(im_w), valid_h=h, valid_w=w,
        min_size=2.0, pre_nms_top=1000, post_nms_top=300, nms_thresh=0.7)
    assert int(n) == 1 and float(scores[0]) == 1.0
    # the stable-reversed convention picks flat index 43
    dense = anchors.dense_anchors(h, w, 8, BASE)
    props = bbox_np.clip_boxes(
        bbox_np.bbox_transform_inv(dense, deltas.reshape(-1, 4)),
        (im_h, im_w))
    np.testing.assert_allclose(np.asarray(rois)[0, 1:], props[43],
                               rtol=1e-6)
