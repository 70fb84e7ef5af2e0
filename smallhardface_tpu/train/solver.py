"""Caffe-semantics SGD solver as pure JAX functions.

Reproduces SGDSolver::ApplyUpdate (/root/reference/caffe/src/caffe/solvers/
sgd_solver.cpp:102-244) exactly:

  rate       = base_lr * gamma^k           (step / multistep policies, :27-100)
  g_norm     = grad / iter_size            (Normalize — here folded into the
                                            psum-mean over devices×iter_size)
  g_total    = g_norm + weight_decay * decay_mult * w    (L2 Regularize)
  v          = momentum * v + rate * lr_mult * g_total   (ComputeUpdateValue)
  w          = w - v

Per-parameter lr_mult/decay_mult trees come from
models.detector.param_multipliers (the template ParamSpecs after
_apply_mult_lr). Momentum state ("history") is checkpointed like
.solverstate (sgd_solver.cpp:246-330).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def learning_rate(iteration, cfg):
    """Host-side scalar LR for an iteration (sgd_solver.cpp:27-100)."""
    base = float(cfg.TRAIN.LR.BASELR)
    gamma = 0.1
    if cfg.TRAIN.LR_POLICY == "STEP":
        k = iteration // int(cfg.TRAIN.STEPSIZE)
        return base * (gamma ** k)
    if cfg.TRAIN.LR_POLICY == "MULTISTEP":
        k = sum(1 for sv in cfg.TRAIN.STEPVALUE if iteration >= sv)
        return base * (gamma ** k)
    raise NotImplementedError(
        f"Unknown LR policy: {cfg.TRAIN.LR_POLICY}")


def init_momentum(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd_update(params, grads, momentum_state, *, rate, lr_mults, decay_mults,
               weight_decay, momentum=0.9):
    """One Caffe SGD step. All tree arguments share the params structure;
    lr_mults/decay_mults are float-leaf trees. Returns (params, momentum)."""

    def upd(w, g, v, lr_mult, decay_mult):
        lr_mult = jnp.asarray(lr_mult, w.dtype)
        g_total = g + weight_decay * decay_mult * w
        v_new = momentum * v + rate * lr_mult * g_total
        return w - v_new, v_new

    flat_w, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_v = treedef.flatten_up_to(momentum_state)
    flat_lm = treedef.flatten_up_to(lr_mults)
    flat_dm = treedef.flatten_up_to(decay_mults)
    new_w, new_v = [], []
    for w, g, v, lm, dm in zip(flat_w, flat_g, flat_v, flat_lm, flat_dm):
        if lm == 0.0:
            # frozen param (lr_mult 0): no update, no momentum accumulation
            new_w.append(w)
            new_v.append(v)
            continue
        wn, vn = upd(w, g, v, lm, dm)
        new_w.append(wn)
        new_v.append(vn)
    return (jax.tree_util.tree_unflatten(treedef, new_w),
            jax.tree_util.tree_unflatten(treedef, new_v))
