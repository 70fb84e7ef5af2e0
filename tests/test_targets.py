"""Anchor-target + OHEM parity against a numpy oracle that mirrors the
reference MultiLayerAnchorLayer forward
(/root/reference/lib/layers/multi_layer_anchor_layer.py:88-338)."""

import numpy as np
import jax.numpy as jnp
import pytest

from smallhardface_tpu.ops import anchors as anchors_mod, bbox_np
from smallhardface_tpu.train import targets as tg

BASE = anchors_mod.generate_anchors(base_size=16, ratios=[1],
                                    scales=[1, 2, 4], shifts=[0],
                                    strides=[8, 8, 8])


def oracle(bg_prob, gt, im_h, im_w, tc: tg.TargetConfig):
    """Single-level reference semantics in plain numpy."""
    h, w, A = bg_prob.shape
    all_anchors = anchors_mod.dense_anchors(h, w, 8, BASE)
    n = all_anchors.shape[0]
    inside = np.where(
        (all_anchors[:, 0] >= 0) & (all_anchors[:, 1] >= 0) &
        (all_anchors[:, 2] < im_w) & (all_anchors[:, 3] < im_h))[0]
    if inside.size == 0:
        inside = np.arange(n)
    anchors_in = all_anchors[inside]
    labels = np.full(len(inside), -1.0)
    if gt.shape[0] == 0:
        # no gts: everything is background-eligible (reference filters such
        # images out of the roidb, lib/train.py:188-213; the device path
        # treats them as max_iou 0)
        gt = np.array([[0.0, 0, 0, 0, 1]])
        overlaps = np.zeros((len(inside), 1))
    else:
        overlaps = bbox_np.bbox_overlaps(anchors_in, gt[:, :4])
    argmax = overlaps.argmax(axis=1)
    maxov = overlaps[np.arange(len(inside)), argmax]
    labels[maxov < tc.negative_overlap] = 0
    fg_ids = np.where(maxov >= tc.positive_overlap)[0]
    labels[fg_ids] = gt[argmax[fg_ids], 4]
    scores = bg_prob.reshape(-1)[inside]
    pos_conf = 1 - scores[fg_ids]
    easy = bool(np.all(pos_conf >= tc.easy_threshold))
    num_fg = int(tc.fg_fraction * tc.anchors_per_batch)
    if len(fg_ids) > num_fg and tc.positive_mining:
        order = pos_conf.argpartition(num_fg)
        labels[fg_ids[order[num_fg:]]] = -1
    n_fg = int((labels > 0).sum())
    num_bg = tc.anchors_per_batch - n_fg
    bg_ids = np.where(labels == 0)[0]
    if len(bg_ids) > num_bg:
        order = scores[bg_ids].argpartition(num_bg)
        sampled = bg_ids[order[:num_bg]]
        labels[bg_ids] = -1
        labels[sampled] = 0
    reg_ids = np.where(maxov >= tc.regression_overlap)[0]
    targets = np.zeros((len(inside), 4))
    targets[reg_ids] = bbox_np.bbox_transform(anchors_in[reg_ids],
                                              gt[argmax[reg_ids], :4])
    outw = np.zeros((len(inside), 4))
    if reg_ids.size:
        outw[reg_ids] = 1.0 / reg_ids.size
    # unmap
    full_labels = np.full(n, -1.0)
    full_labels[inside] = labels
    full_t = np.zeros((n, 4))
    full_t[inside] = targets
    full_ow = np.zeros((n, 4))
    full_ow[inside] = outw
    return full_labels, full_t, full_ow, easy


def _run_both(rng, h=8, w=10, n_gt=5, im_frac=1.0, seed_scores=None,
              tc=None):
    tc = tc or tg.TargetConfig(easy_enable=True, easy_threshold=0.85)
    im_h, im_w = 8.0 * h * im_frac, 8.0 * w * im_frac
    bg_prob = rng.uniform(0.01, 0.99, (h, w, 3))
    gt = np.zeros((8, 5))
    gt_mask = np.zeros(8, bool)
    for i in range(n_gt):
        x1 = rng.uniform(0, im_w * 0.7)
        y1 = rng.uniform(0, im_h * 0.7)
        s = rng.uniform(8, 70)
        gt[i] = [x1, y1, x1 + s, y1 + s, 1.0]
        gt_mask[i] = True
    out = tg.anchor_targets(
        jnp.asarray(bg_prob), BASE, jnp.asarray(gt), jnp.asarray(gt_mask),
        im_h=jnp.float32(im_h), im_w=jnp.float32(im_w),
        valid_h=h, valid_w=w, tc=tc)
    o_labels, o_t, o_ow, o_easy = oracle(bg_prob, gt[:n_gt], im_h, im_w, tc)
    return out, (o_labels, o_t, o_ow, o_easy)


def test_targets_match_oracle(rng):
    for trial in range(4):
        out, (o_labels, o_t, o_ow, o_easy) = _run_both(
            rng, h=6 + trial, w=9, n_gt=2 + trial)
        np.testing.assert_array_equal(np.asarray(out["labels"]), o_labels)
        np.testing.assert_allclose(np.asarray(out["bbox_targets"]), o_t,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["outside_weights"]), o_ow,
                                   rtol=1e-5, atol=1e-7)
        assert bool(out["easy"]) == o_easy


def test_targets_ohem_subsampling(rng):
    """Dense gt coverage forces more candidates than the budget; OHEM must
    keep exactly num_fg hardest positives and fill to 256 with negatives."""
    h, w = 12, 12
    tc = tg.TargetConfig()
    im_h = im_w = 8.0 * 12
    bg_prob = rng.uniform(0.01, 0.99, (h, w, 3))
    # one huge gt overlapping many anchors
    gt = np.zeros((8, 5))
    gt[0] = [2, 2, 90, 90, 1.0]
    gt[1] = [20, 20, 52, 52, 1.0]
    gt_mask = np.zeros(8, bool)
    gt_mask[:2] = True
    out = tg.anchor_targets(
        jnp.asarray(bg_prob), BASE, jnp.asarray(gt), jnp.asarray(gt_mask),
        im_h=jnp.float32(im_h), im_w=jnp.float32(im_w),
        valid_h=h, valid_w=w, tc=tc)
    labels = np.asarray(out["labels"])
    o_labels, _, _, _ = oracle(bg_prob, gt[:2], im_h, im_w, tc)
    np.testing.assert_array_equal(labels, o_labels)
    n_fg = (labels > 0).sum()
    n_bg = (labels == 0).sum()
    assert n_fg + n_bg <= 256
    assert n_fg <= 64


def test_targets_no_gt_all_easy(rng):
    """No positives → easy flag vacuously true (python all([]) quirk,
    reference :196-206)."""
    out, (o_labels, _, _, o_easy) = _run_both(rng, n_gt=0)
    assert o_easy is True
    assert bool(out["easy"]) is True
    labels = np.asarray(out["labels"])
    assert (labels > 0).sum() == 0
    np.testing.assert_array_equal(labels, o_labels)


def test_losses_softmax_ce():
    from smallhardface_tpu.train.losses import softmax_ce_with_ignore
    logits = jnp.asarray([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    labels = jnp.asarray([0.0, 1.0, -1.0])
    got = float(softmax_ce_with_ignore(logits, labels))
    want = np.mean([
        -np.log(np.exp(2) / (np.exp(2) + 1)),
        -np.log(np.exp(3) / (np.exp(3) + 1)),
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # all ignored -> 0
    assert float(softmax_ce_with_ignore(logits, jnp.full((3,), -1.0))) == 0.0


def test_losses_smooth_l1_sigma3():
    from smallhardface_tpu.train.losses import smooth_l1
    sigma2 = 9.0
    pred = jnp.asarray([[0.05, 0.5, -0.5, 0.0]])
    targ = jnp.zeros((1, 4))
    inw = jnp.ones((1, 4))
    outw = jnp.ones((1, 4))
    got = float(smooth_l1(pred, targ, inw, outw, sigma=3.0))
    want = (0.5 * sigma2 * 0.05 ** 2 +          # |x| < 1/9: quadratic
            (0.5 - 0.5 / sigma2) * 2 + 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_solver_matches_caffe_semantics():
    """Two-step analytic check of momentum/decay/lr_mult coupling
    (the oracle pattern of test_gradient_based_solver.cpp:23-596)."""
    import jax
    from smallhardface_tpu.train import solver

    w0 = {"a": {"w": jnp.asarray([1.0, -2.0]), "b": jnp.asarray([0.5])}}
    lr_mults = {"a": {"w": 2.0, "b": 4.0}}
    decay_mults = {"a": {"w": 1.0, "b": 0.0}}
    g = {"a": {"w": jnp.asarray([0.1, 0.2]), "b": jnp.asarray([-0.3])}}
    v = solver.init_momentum(w0)
    rate, wd, mu = 0.01, 0.0005, 0.9

    p1, v1 = solver.sgd_update(w0, g, v, rate=rate, lr_mults=lr_mults,
                               decay_mults=decay_mults, weight_decay=wd,
                               momentum=mu)
    exp_vw = rate * 2.0 * (np.array([0.1, 0.2]) + wd * np.array([1.0, -2.0]))
    exp_vb = rate * 4.0 * np.array([-0.3])
    np.testing.assert_allclose(np.asarray(v1["a"]["w"]), exp_vw, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1["a"]["w"]),
                               np.array([1.0, -2.0]) - exp_vw, rtol=1e-6)
    p2, v2 = solver.sgd_update(p1, g, v1, rate=rate, lr_mults=lr_mults,
                               decay_mults=decay_mults, weight_decay=wd,
                               momentum=mu)
    exp_vw2 = mu * exp_vw + rate * 2.0 * (
        np.array([0.1, 0.2]) + wd * np.asarray(p1["a"]["w"]))
    np.testing.assert_allclose(np.asarray(v2["a"]["w"]), exp_vw2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v2["a"]["b"]),
                               mu * exp_vb + rate * 4.0 * np.array([-0.3]),
                               rtol=1e-6)


def test_solver_frozen_params():
    import jax.numpy as jnp
    from smallhardface_tpu.train import solver
    w0 = {"c": {"w": jnp.asarray([1.0])}}
    lr_mults = {"c": {"w": 0.0}}
    decay_mults = {"c": {"w": 0.0}}
    g = {"c": {"w": jnp.asarray([5.0])}}
    v = solver.init_momentum(w0)
    p1, v1 = solver.sgd_update(w0, g, v, rate=1.0, lr_mults=lr_mults,
                               decay_mults=decay_mults, weight_decay=0.1)
    np.testing.assert_array_equal(np.asarray(p1["c"]["w"]), [1.0])
    np.testing.assert_array_equal(np.asarray(v1["c"]["w"]), [0.0])


def test_learning_rate_policies():
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.train.solver import learning_rate
    old = (cfg.TRAIN.LR.BASELR, cfg.TRAIN.LR_POLICY, cfg.TRAIN.STEPSIZE,
           cfg.TRAIN.STEPVALUE)
    try:
        cfg.TRAIN.LR.BASELR = 0.004
        cfg.TRAIN.LR_POLICY = "STEP"
        cfg.TRAIN.STEPSIZE = 46000
        assert learning_rate(0, cfg) == 0.004
        assert learning_rate(45999, cfg) == 0.004
        np.testing.assert_allclose(learning_rate(46000, cfg), 0.0004)
        cfg.TRAIN.LR_POLICY = "MULTISTEP"
        cfg.TRAIN.STEPVALUE = [21000, 42000]
        assert learning_rate(20999, cfg) == 0.004
        np.testing.assert_allclose(learning_rate(21000, cfg), 0.0004)
        np.testing.assert_allclose(learning_rate(42000, cfg), 0.00004)
    finally:
        (cfg.TRAIN.LR.BASELR, cfg.TRAIN.LR_POLICY, cfg.TRAIN.STEPSIZE,
         cfg.TRAIN.STEPVALUE) = old


def test_learning_rate_policy_family():
    """Analytic values for the full lr_policy family
    (sgd_solver.cpp:27-100), in the style of the reference's
    test_gradient_based_solver.cpp."""
    import math
    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.train.solver import learning_rate

    keys = ("LR_POLICY", "STEPSIZE", "GAMMA", "POWER", "ITERS")
    old_lr = cfg.TRAIN.LR.BASELR
    old = {k: cfg.TRAIN[k] for k in keys}
    try:
        cfg.TRAIN.LR.BASELR = 0.01
        cfg.TRAIN.GAMMA = 0.5
        cfg.TRAIN.POWER = 2.0
        cfg.TRAIN.STEPSIZE = 10
        cfg.TRAIN.ITERS = 100

        cfg.TRAIN.LR_POLICY = "FIXED"
        for it in (0, 7, 99):
            assert learning_rate(it, cfg) == 0.01

        cfg.TRAIN.LR_POLICY = "EXP"
        np.testing.assert_allclose(learning_rate(0, cfg), 0.01)
        np.testing.assert_allclose(learning_rate(3, cfg), 0.01 * 0.5 ** 3)

        cfg.TRAIN.LR_POLICY = "INV"
        np.testing.assert_allclose(learning_rate(0, cfg), 0.01)
        np.testing.assert_allclose(
            learning_rate(6, cfg), 0.01 * (1 + 0.5 * 6) ** -2.0)

        cfg.TRAIN.LR_POLICY = "POLY"
        np.testing.assert_allclose(learning_rate(0, cfg), 0.01)
        np.testing.assert_allclose(
            learning_rate(25, cfg), 0.01 * (1 - 25 / 100.0) ** 2.0)
        np.testing.assert_allclose(learning_rate(100, cfg), 0.0)

        cfg.TRAIN.LR_POLICY = "SIGMOID"
        np.testing.assert_allclose(learning_rate(10, cfg), 0.01 / 2.0)
        np.testing.assert_allclose(
            learning_rate(14, cfg),
            0.01 / (1 + math.exp(-0.5 * (14 - 10))))
    finally:
        cfg.TRAIN.LR.BASELR = old_lr
        for k in keys:
            cfg.TRAIN[k] = old[k]
