"""Native checkpoint format: flattened-key .npz with weights, optimizer
momentum, and iteration counter.

Covers the reference's `.caffemodel` + `.solverstate` pair
(/root/reference/caffe/src/caffe/solver.cpp:403-472,
 solvers/sgd_solver.cpp:246-330) in one artifact, and adds what the
reference lacked: a mid-run resume path for the Python driver
(SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

_SEP = "//"


def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save(path, params, opt_state=None, iteration=0, extra=None):
    """Atomic single-writer snapshot (rank-0 style,
    reference lib/train.py:65-84)."""
    payload = {}
    for k, v in _flatten(params).items():
        payload[f"params{_SEP}{k}"] = v
    if opt_state is not None:
        for k, v in _flatten(opt_state).items():
            payload[f"opt{_SEP}{k}"] = v
    payload["meta//iteration"] = np.int64(iteration)
    if extra:
        for k, v in extra.items():
            payload[f"extra{_SEP}{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)
    logger.info("Wrote snapshot to: %s", path)


def load(path):
    """Returns (params, opt_state or None, iteration, extra)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten({k[len(f"params{_SEP}"):]: v
                         for k, v in flat.items()
                         if k.startswith(f"params{_SEP}")})
    opt_flat = {k[len(f"opt{_SEP}"):]: v for k, v in flat.items()
                if k.startswith(f"opt{_SEP}")}
    opt_state = _unflatten(opt_flat) if opt_flat else None
    iteration = int(flat.get("meta//iteration", 0))
    extra = {k[len(f"extra{_SEP}"):]: v for k, v in flat.items()
             if k.startswith(f"extra{_SEP}")}
    return params, opt_state, iteration, extra


def load_params(path, reference_params=None):
    """Load weights only, as jnp arrays; verifies shapes when a reference
    tree is given (name-addressed, like Net::CopyTrainedLayersFrom)."""
    import jax.numpy as jnp
    params, _, _, _ = load(path)
    out = {k: {k2: jnp.asarray(v2) for k2, v2 in v.items()}
           for k, v in params.items()}
    if reference_params is not None:
        for name, leaf in reference_params.items():
            if name not in out:
                logger.warning("Checkpoint missing param %s; keeping init",
                               name)
                out[name] = leaf
                continue
            for k in leaf:
                assert tuple(out[name][k].shape) == tuple(leaf[k].shape), \
                    f"shape mismatch for {name}/{k}"
    return out


def find_trained_weights(repo_root=None):
    """Trained-checkpoint candidates on this machine, newest first:
    $SHF_TRAINED_WEIGHTS (if set) leads, then every output/**/final.npz
    under the repo by mtime. One shared definition of "find the trained
    weights" for tools (pyramid_time) and the trained-golden test — the
    weights are machine-bound (too large for git), so discovery rather
    than a pinned path."""
    import glob
    root = repo_root or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = os.environ.get("SHF_TRAINED_WEIGHTS")
    cands = [env] if env else []
    cands += sorted(
        glob.glob(os.path.join(root, "output", "**", "final.npz"),
                  recursive=True),
        key=os.path.getmtime, reverse=True)
    return [c for c in cands if c and os.path.exists(c)]
