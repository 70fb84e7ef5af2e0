"""Training losses.

- softmax_ce_with_ignore: Caffe SoftmaxWithLoss with ignore_label=-1 and
  normalize=true (VALID normalization — divide by the count of non-ignored
  anchors), as wired in the train templates
  (/root/reference/models/train_different_dilation_template.prototxt:698-711,
   caffe/src/caffe/layers/softmax_loss_layer.cpp).
- smooth_l1: the fork-added SmoothL1LossLayer with sigma=3 and
  inside/outside weights (smooth_l1_loss_layer.cu:8-116): the kernel knee
  sits at |x| < 1/sigma^2; the total is divided by the batch size (1 image).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_ce_with_ignore(logits, labels):
    """logits: (N, C); labels: (N,) float with -1 = ignore.
    Returns sum of per-anchor CE over valid anchors / count(valid)."""
    valid = labels >= 0
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe_labels[:, None], axis=1)[:, 0]
    loss = -jnp.where(valid, picked, 0.0).sum()
    count = valid.sum()
    return jnp.where(count > 0, loss / jnp.maximum(count, 1), 0.0)


def smooth_l1(pred, targets, inside_w, outside_w, sigma=3.0):
    """pred/targets/weights: (N, 4). Caffe semantics:
    diff = inside_w * (pred - target); f(d) = 0.5*(sigma*d)^2 if
    |d| < 1/sigma^2 else |d| - 0.5/sigma^2; loss = sum(outside_w * f) / num
    with num = batch size = 1 here."""
    sigma2 = sigma * sigma
    diff = inside_w * (pred - targets)
    ad = jnp.abs(diff)
    f = jnp.where(ad < 1.0 / sigma2,
                  0.5 * sigma2 * diff * diff,
                  ad - 0.5 / sigma2)
    return (outside_w * f).sum()
