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

import functools

import jax
import jax.numpy as jnp


def learning_rate(iteration, cfg):
    """Host-side scalar LR for an iteration — the full lr_policy family of
    SGDSolver::GetLearningRate (sgd_solver.cpp:27-100)."""
    import math

    base = float(cfg.TRAIN.LR.BASELR)
    gamma = float(cfg.TRAIN.get("GAMMA", 0.1))
    power = float(cfg.TRAIN.get("POWER", 1.0))
    policy = cfg.TRAIN.LR_POLICY
    if policy == "FIXED":
        return base
    if policy == "STEP":
        k = iteration // int(cfg.TRAIN.STEPSIZE)
        return base * (gamma ** k)
    if policy == "EXP":
        return base * (gamma ** iteration)
    if policy == "INV":
        return base * (1.0 + gamma * iteration) ** (-power)
    if policy == "MULTISTEP":
        k = sum(1 for sv in cfg.TRAIN.STEPVALUE if iteration >= sv)
        return base * (gamma ** k)
    if policy == "POLY":
        return base * (1.0 - iteration / float(cfg.TRAIN.ITERS)) ** power
    if policy == "SIGMOID":
        return base / (1.0 + math.exp(
            -gamma * (iteration - float(cfg.TRAIN.STEPSIZE))))
    raise NotImplementedError(f"Unknown LR policy: {policy}")


def init_momentum(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def init_state(params, solver_type="SGD"):
    """Optimizer state for any solver in the family. SGD/Nesterov keep one
    momentum slot; Adam/AdaDelta/RMSProp variants keep two."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    if solver_type in ("SGD", "NESTEROV", "ADAGRAD", "RMSPROP"):
        return {"h1": zeros}
    if solver_type in ("ADAM", "ADADELTA"):
        return {"h1": zeros,
                "h2": jax.tree_util.tree_map(jnp.zeros_like, params)}
    raise NotImplementedError(f"Unknown solver type: {solver_type}")


def sgd_update(params, grads, momentum_state, *, rate, lr_mults, decay_mults,
               weight_decay, momentum=0.9):
    """One Caffe SGD step — thin wrapper over apply_update('SGD') keeping
    the (params, momentum_tree) signature the train loop and checkpoints
    use. All tree arguments share the params structure; lr_mults /
    decay_mults are float-leaf trees. Returns (params, momentum)."""
    new_params, state = apply_update(
        params, grads, {"h1": momentum_state}, solver_type="SGD",
        rate=rate, lr_mults=lr_mults, decay_mults=decay_mults,
        weight_decay=weight_decay, momentum=momentum)
    return new_params, state["h1"]


def apply_update(params, grads, state, *, solver_type="SGD", rate,
                 lr_mults, decay_mults, weight_decay, momentum=0.9,
                 iteration=0, adam_beta1=0.9, adam_beta2=0.999,
                 delta=1e-8, rms_decay=0.99):
    """Generic per-parameter update for the Caffe solver family
    (/root/reference/caffe/src/caffe/solvers/*.cpp). L2 regularization is
    always folded into the gradient first (decay_mult-scaled), like
    SGDSolver::Regularize. Returns (params, state)."""

    def per_leaf(w, g, h1, h2, lm, dm):
        if lm == 0.0:
            return w, h1, h2
        lr = rate * lm
        g = g + weight_decay * dm * w
        if solver_type == "SGD":
            v = momentum * h1 + lr * g
            return w - v, v, h2
        if solver_type == "NESTEROV":
            # nesterov_solver.cpp: v' = mu*v + lr*g; update = (1+mu)v' - mu*v
            v = momentum * h1 + lr * g
            upd = (1 + momentum) * v - momentum * h1
            return w - upd, v, h2
        if solver_type == "ADAGRAD":
            h = h1 + g * g
            return w - lr * g / (jnp.sqrt(h) + delta), h, h2
        if solver_type == "RMSPROP":
            h = rms_decay * h1 + (1 - rms_decay) * g * g
            return w - lr * g / (jnp.sqrt(h) + delta), h, h2
        if solver_type == "ADADELTA":
            h = momentum * h1 + (1 - momentum) * g * g
            upd = g * jnp.sqrt((h2 + delta) / (h + delta))
            h2n = momentum * h2 + (1 - momentum) * upd * upd
            return w - lr * upd, h, h2n
        if solver_type == "ADAM":
            # adam_solver.cpp: t = iter + 1
            t = iteration + 1
            m = adam_beta1 * h1 + (1 - adam_beta1) * g
            v = adam_beta2 * h2 + (1 - adam_beta2) * g * g
            corr = (jnp.sqrt(1.0 - adam_beta2 ** t) /
                    (1.0 - adam_beta1 ** t))
            return (w - lr * corr * m / (jnp.sqrt(v) + delta), m, v)
        raise NotImplementedError(f"Unknown solver type: {solver_type}")

    flat_w, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_h1 = treedef.flatten_up_to(state["h1"])
    flat_h2 = (treedef.flatten_up_to(state["h2"])
               if "h2" in state else [None] * len(flat_w))
    flat_lm = treedef.flatten_up_to(lr_mults)
    flat_dm = treedef.flatten_up_to(decay_mults)
    ws, h1s, h2s = [], [], []
    for w, g, h1, h2, lm, dm in zip(flat_w, flat_g, flat_h1, flat_h2,
                                    flat_lm, flat_dm):
        wn, h1n, h2n = per_leaf(w, g, h1, h2, lm, dm)
        ws.append(wn)
        h1s.append(h1n)
        h2s.append(h2n)
    unf = functools.partial(jax.tree_util.tree_unflatten, treedef)
    new_state = {"h1": unf(h1s)}
    if "h2" in state:
        new_state["h2"] = unf(h2s)
    return unf(ws), new_state
