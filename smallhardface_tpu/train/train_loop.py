"""Data-parallel training loop over a TPU mesh.

Replaces the reference's process-per-GPU + NCCL orchestration
(/root/reference/lib/train.py:90-258, caffe/src/caffe/parallel.cpp:125-257):
one process drives a jax.sharding.Mesh; the jitted train step shard_maps the
per-device gradient computation and psums over the 'data' axis (the
allreduce), then applies the Caffe-semantics SGD update on replicated
params. iter_size gradient accumulation runs as a lax.scan over micro-images
inside the step (solver.cpp:208-211), so memory matches the 1-image case.

Shapes are bucketed: each iteration all replicas share one padded
(H, W, G) bucket chosen from the global batch, so the number of compiled
programs stays bounded while image sizes vary (multi-scale training).

The easy-image mining feedback crosses device→host once per step as a small
bool array; the loaders consume it at epoch reshuffle
(multi_layer_anchor_layer.py:329-338 → roi_data_layer/layer.py:37-50).
"""

from __future__ import annotations

import datetime
import functools
import logging
import math
import os
import os.path as osp
import signal
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from smallhardface_tpu.config import cfg
from smallhardface_tpu.models import detector as detector_mod
from smallhardface_tpu.ops import anchors as anchors_mod
from smallhardface_tpu.parallel.mesh import make_mesh, DATA_AXIS
from smallhardface_tpu.train import targets as targets_mod
from smallhardface_tpu.train import solver as solver_mod
from smallhardface_tpu.train.loader import RoIDataLoader
from smallhardface_tpu.train.losses import (
    softmax_ce_with_ignore, smooth_l1)
from smallhardface_tpu.io import checkpoint
from smallhardface_tpu.utils.timer import Timer
from smallhardface_tpu.utils.tensorboard import tb

logger = logging.getLogger(__name__)

BUCKET = 128  # spatial padding granularity for train shape reuse

# metric layout of the packed per-step metrics array (see _pack_metrics):
# one (n_dev, K, iter_size) float32 array instead of a dict of five —
# each np.asarray on a separate device array pays a full tunnel RTT
# (~29 ms; the dict readback measured 89.6 ms, tools/train_time.py), so
# the loop reads ONE array per iteration
METRIC_KEYS = ("cls_loss", "reg_loss", "accuracy", "easy", "n_fg")

_pack_metrics = jax.jit(lambda m: jnp.stack(
    [m[k].astype(jnp.float32) for k in METRIC_KEYS], axis=1))


def _unpack_metrics(arr):
    """(n_dev, K, iter_size) float32 → the metrics dict (easy back to
    bool for the mining feedback)."""
    out = {k: arr[:, j] for j, k in enumerate(METRIC_KEYS)}
    out["easy"] = out["easy"] > 0.5
    return out


def get_training_roidb(imdb):
    """Flip-augment, prepare, and filter the roidb
    (/root/reference/lib/train.py:181-227)."""
    if cfg.TRAIN.USE_FLIPPED:
        logger.info("Appending horizontally-flipped training examples...")
        imdb.append_flipped_images()
        logger.info("done")
    logger.info("Preparing training data...")
    imdb.prepare_roidb()

    def is_valid(entry):
        overlaps = entry["max_overlaps"]
        fg = np.where(overlaps >= cfg.TRAIN.ANCHOR_POSITIVE_OVERLAP)[0]
        bg = np.where((overlaps < cfg.TRAIN.BG_THRESH_HI) &
                      (overlaps >= cfg.TRAIN.BG_THRESH_LOW))[0]
        return len(fg) > 0 or len(bg) > 0

    final = [e for e in imdb.roidb if is_valid(e)]
    logger.info("done")
    return final


def preprocess_image(data, scl, crp, im_hw, out_shape, pixel_mean):
    """Fused device-side training preprocess: data is the distorted uint8
    ORIGINAL (edge-padded); the resize to the training scale and the
    random crop fuse into one scale_and_translate (cv2 fx-sampling
    convention, translation = -crop offset). Mean subtraction follows on
    device; the region beyond the final (im_h, im_w) extent zeroes out to
    match the reference's post-mean zero padding (minibatch.py:47-53)."""
    hb, wb = out_shape
    img = data.astype(jnp.float32)
    resized = jax.image.scale_and_translate(
        img, (hb, wb, 3), (0, 1),
        scale=jnp.stack([scl, scl]),
        translation=-crp.astype(jnp.float32),
        method="linear", antialias=False)
    ys = lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
    xs = lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
    inside = ((ys[..., None] < im_hw[0]) & (xs[..., None] < im_hw[1]))
    return jnp.where(inside, resized - pixel_mean, 0.0)


def _make_loss_fn(spec, tc, compute_dtype, axis_name, stop_at=None,
                  spatial_mesh=None, spatial_axis="sp"):
    """One micro-batch's loss. axis_name = the shard_map data axis of the
    DP step (varying-type annotations + the Pallas stem VJP need it), or
    None when the caller runs under plain jit (the spatial step, where
    the SPMD partitioner owns the sharding). spatial_mesh routes the stem
    through fused_stem_spatial — its custom VJP wraps shard_map'd
    forward/backward kernels at the OUTER level, so the SPMD partitioner
    never has to partition a Pallas custom call (the reason the spatial
    step previously paid the ~10× XLA stem chain).

    stop_at truncates the computation for the train-time bisection probe
    (tools/train_time.py): "preproc" returns after the fused device
    preprocess, "forward" after the detector forward — each as a scalar
    sum so XLA cannot dead-code the stage."""
    base_anchors = anchors_mod.generate_anchors(
        base_size=16, ratios=[1],
        scales=list(detector_mod.ANCHOR_SCALES), shifts=[0],
        strides=[detector_mod.FEAT_STRIDE] * 3)
    pixel_mean = jnp.asarray(cfg.PIXEL_MEANS, jnp.float32).reshape(1, 1, 3)

    def loss_fn(params, out_shape, data, scl, crp, gt, gt_mask, im_hw,
                valid_hw):
        x = preprocess_image(data, scl, crp, im_hw, out_shape, pixel_mean)
        if stop_at == "preproc":
            return x.sum(), {}
        out = detector_mod.forward(
            params, x[None], spec, compute_dtype=compute_dtype,
            valid_hw=(valid_hw[0] * detector_mod.FEAT_STRIDE,
                      valid_hw[1] * detector_mod.FEAT_STRIDE),
            mask_mode=detector_mod.mask_plan(
                str(cfg.TPU.MASK_MODE), train=True)[0],
            s2d_stem=bool(cfg.TPU.S2D_STEM),
            # backend gate lives in detector.forward (pallas_stem
            # .backend_ok(): the kernel only lowers on TPU; CPU-mesh
            # runs — tests, PDB mode — silently take the XLA stem
            # unless TESTING_INTERPRET opts in)
            pallas_stem=bool(cfg.TPU.PALLAS_STEM_TRAIN)
            and (axis_name is not None or spatial_mesh is not None),
            stem_vma=(axis_name,) if axis_name else None,
            spatial_mesh=spatial_mesh, spatial_axis=spatial_axis)
        logits = out["cls_logits"][0]
        deltas = out["bbox_deltas"][0]
        if stop_at == "forward":
            return logits.sum() + deltas.sum(), {}
        bg_prob = lax.stop_gradient(
            jax.nn.softmax(logits, axis=-1)[..., 0])
        tgt = targets_mod.anchor_targets(
            bg_prob, base_anchors, gt, gt_mask,
            im_h=im_hw[0], im_w=im_hw[1],
            valid_h=valid_hw[0], valid_w=valid_hw[1], tc=tc,
            axis_name=axis_name)
        cls_loss = softmax_ce_with_ignore(
            logits.reshape(-1, 2), tgt["labels"])
        reg_loss = smooth_l1(
            deltas.reshape(-1, 4), tgt["bbox_targets"],
            tgt["inside_weights"], tgt["outside_weights"])
        aux = {
            "cls_loss": cls_loss,
            "reg_loss": reg_loss,
            "accuracy": tgt["accuracy"],
            "easy": tgt["easy"],
            "n_fg": tgt["n_fg"],
        }
        return cls_loss + reg_loss, aux

    return loss_fn


def make_train_step(spec, tc, mesh, iter_size, *, weight_decay,
                    momentum=0.9, compute_dtype=None, solver_type="SGD"):
    """Build the jitted global train step. Compiled per (H, W, G) bucket."""
    n_dev = mesh.devices.size
    lr_mults, decay_mults = detector_mod.param_multipliers(spec)
    loss_fn = _make_loss_fn(spec, tc, compute_dtype, DATA_AXIS)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True, argnums=0)

    def make_device_grads(out_shape):
        def device_grads(params, data, scl, crp, gt, gt_mask, im_hw,
                         valid_hw):
            # shards carry a leading device axis of size 1
            data, scl, crp, gt = data[0], scl[0], crp[0], gt[0]
            gt_mask, im_hw, valid_hw = gt_mask[0], im_hw[0], valid_hw[0]

            def micro(gsum, xs):
                (_, aux), g = grad_fn(params, out_shape, *xs)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return gsum, aux

            g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
            gsum, auxes = lax.scan(
                micro, g0, (data, scl, crp, gt, gt_mask, im_hw, valid_hw))
            gsum = lax.psum(gsum, DATA_AXIS)
            grads = jax.tree_util.tree_map(
                lambda g: g / (n_dev * iter_size), gsum)
            metrics = {k: v[None] for k, v in auxes.items()}   # (1, I)
            return grads, metrics
        return device_grads

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnums=(4,))
    def step(params, opt_state, rate, iteration, out_shape, data, scl, crp,
             gt, gt_mask, im_hw, valid_hw):
        # check_vma=False: with vma typing ON, jax 0.9's AD transposes
        # grads of the replicated params to ALREADY-psum'd (invariant)
        # values inside shard_map, so the explicit psum below would
        # double-count by n_dev (proven against a single-device oracle,
        # round 4; the Pallas stem VJP's grads stay honest partials
        # either way, which is why mixed typing can't be psum'd
        # uniformly). With vma OFF the transpose emits per-device
        # partials for every leaf and the single psum is exact.
        sharded = shard_map(
            make_device_grads(out_shape), mesh=mesh,
            in_specs=(P(),) + (P(DATA_AXIS),) * 7,
            out_specs=(P(), P(DATA_AXIS)), check_vma=False)
        grads, metrics = sharded(params, data, scl, crp, gt, gt_mask,
                                 im_hw, valid_hw)
        new_params, new_state = solver_mod.apply_update(
            params, grads, opt_state, solver_type=solver_type, rate=rate,
            lr_mults=lr_mults, decay_mults=decay_mults,
            weight_decay=weight_decay, momentum=momentum,
            iteration=iteration)
        return new_params, new_state, metrics

    return step


def make_train_step_spatial(spec, tc, sp_mesh, iter_size, *, weight_decay,
                            momentum=0.9, compute_dtype=None,
                            solver_type="SGD"):
    """Train step with each image's H axis sharded across `sp_mesh` —
    the resolution-scaling axis (SURVEY §5) applied to TRAINING, for
    images whose activations exceed one chip's HBM. Where the DP step is
    a shard_map over 'data', this is a plain jit with sharding
    constraints (exactly like spatial inference): the SPMD partitioner
    inserts the conv halo exchanges in the forward AND the transposed
    backward, and grads of the replicated params come out replicated.
    The anchor-target/OHEM selections (global top-k over the image)
    partition the same way — no hand-written collectives.

    Call signature and array layout match make_train_step with ONE data
    rank: leading device axis of size 1, data (1, iter_size, H, W, 3)
    with the ORIGINAL-image H divisible by the mesh size (train buckets
    are ×32, so any power-of-two mesh qualifies). With
    TPU.PALLAS_STEM_TRAIN the stem runs the fused Pallas kernel here
    too: fused_stem_spatial's custom VJP wraps explicitly shard_map'd
    forward/backward kernels (ppermute halo exchange, psum'd weight
    grads), so the partitioner sees an opaque already-sharded region
    instead of a Pallas call it cannot split.
    Exceeds reference parity (the reference had no model/spatial
    parallelism at all)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = sp_mesh.axis_names[0]
    n_sp = sp_mesh.devices.size
    lr_mults, decay_mults = detector_mod.param_multipliers(spec)
    loss_fn = _make_loss_fn(spec, tc, compute_dtype, None,
                            spatial_mesh=sp_mesh, spatial_axis=axis)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True, argnums=0)
    rep = NamedSharding(sp_mesh, P())
    shard_h = NamedSharding(sp_mesh, P(None, None, axis))

    def step_fn(params, opt_state, rate, iteration, out_shape, data, scl,
                crp, gt, gt_mask, im_hw, valid_hw):
        assert data.shape[2] % n_sp == 0, (
            f"original-image bucket H={data.shape[2]} is not divisible "
            f"by the {n_sp}-device spatial mesh")
        data, scl, crp, gt = data[0], scl[0], crp[0], gt[0]
        gt_mask, im_hw, valid_hw = gt_mask[0], im_hw[0], valid_hw[0]

        def micro(gsum, xs):
            (_, aux), g = grad_fn(params, out_shape, *xs)
            return jax.tree_util.tree_map(jnp.add, gsum, g), aux

        g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        gsum, auxes = lax.scan(
            micro, g0, (data, scl, crp, gt, gt_mask, im_hw, valid_hw))
        grads = jax.tree_util.tree_map(lambda g: g / iter_size, gsum)
        new_params, new_state = solver_mod.apply_update(
            params, grads, opt_state, solver_type=solver_type, rate=rate,
            lr_mults=lr_mults, decay_mults=decay_mults,
            weight_decay=weight_decay, momentum=momentum,
            iteration=iteration)
        # (1, I) rows like the DP step's per-device metrics layout
        metrics = {k: v[None] for k, v in auxes.items()}
        return new_params, new_state, metrics

    return jax.jit(
        step_fn, donate_argnums=(0, 1), static_argnums=(4,),
        in_shardings=(rep, rep, rep, rep, shard_h) + (rep,) * 6,
        out_shardings=(rep, rep, rep))


def make_train_step_grouped(spec, tc, mesh2d, iter_size, *, weight_decay,
                            momentum=0.9, compute_dtype=None,
                            solver_type="SGD"):
    """G data-parallel groups × K-way spatial sharding in ONE plain-jit
    SPMD step over a 2-D (data, sp) mesh: data arrives (G, iter_size, H,
    W, 3) with G sharded over 'data' and H over 'sp'. The per-image loss
    (incl. its own valid extents and OHEM top-k) is vmapped over G — the
    partitioner maps the vmapped batch dim onto the 'data' axis and
    inserts the conv halo exchanges on 'sp', and the grads' mean over
    G·iter_size becomes the cross-group reduce. This is the training
    analog of eval/serve's TPU.SPATIAL_DEVICES grouping: with D devices
    and SPATIAL_DEVICES=K, train_net forms G = D/K groups instead of
    idling D−K chips on the pure-spatial mesh.

    Structure: shard_map MANUAL over 'data' (the proven DP machinery —
    each group sees its (1, iter_size, ...) slice, grads psum over
    'data'), with 'sp' left AUTO so the SPMD partitioner shards each
    image's H inside the group and inserts the conv halo exchanges in
    forward AND transposed backward, exactly like make_train_step_spatial.
    (A per-image jax.vmap under plain jit expresses the same program but
    hard-crashes XLA's CPU SPMD partitioner — munmap_chunk abort — on
    jax 0.9; the manual-data/auto-sp hybrid avoids batching the
    partitioned convs entirely.) check_vma=False: with an auto axis in
    play the varying-type inference of the scan carry mis-types some
    grad leaves; the single psum below is the only cross-group
    collective, so the safety net is not load-bearing here.

    With TPU.PALLAS_STEM_TRAIN the fused Pallas stem runs HERE TOO
    (round-5 lift of the r4 restriction): fused_stem_spatial's fwd/bwd
    shard_maps resolve the CONTEXT AbstractMesh (pallas_stem._shard_ctx)
    — inside this step's manual-'data' region that mesh types 'data'
    Manual, so the nested shard_map over 'sp' composes; the nested
    region runs untyped (check_vma=False, no vma annotation), the same
    discipline as this step itself. Each group's stem halos ppermute
    over 'sp' within the group; weight-grad psums over 'sp' compose
    with the outer grad psum over 'data'. Exceeds reference parity
    (no model/spatial parallelism upstream)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    d_ax, s_ax = mesh2d.axis_names
    G = mesh2d.shape[d_ax]
    n_sp = mesh2d.shape[s_ax]
    lr_mults, decay_mults = detector_mod.param_multipliers(spec)
    loss_fn = _make_loss_fn(spec, tc, compute_dtype, None,
                            spatial_mesh=mesh2d, spatial_axis=s_ax)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True, argnums=0)
    rep = NamedSharding(mesh2d, P())
    shard_data = NamedSharding(mesh2d, P(d_ax, None, s_ax))
    shard_g = NamedSharding(mesh2d, P(d_ax))

    def make_group_grads(out_shape):
        def group_grads(params, data, scl, crp, gt, gt_mask, im_hw,
                        valid_hw):
            # manual over 'data': this group's (1, iter_size, ...) slice
            data, scl, crp, gt = data[0], scl[0], crp[0], gt[0]
            gt_mask, im_hw, valid_hw = gt_mask[0], im_hw[0], valid_hw[0]

            def micro(gsum, xs):
                (_, aux), g = grad_fn(params, out_shape, *xs)
                return jax.tree_util.tree_map(jnp.add, gsum, g), aux

            g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
            gsum, auxes = lax.scan(
                micro, g0, (data, scl, crp, gt, gt_mask, im_hw, valid_hw))
            gsum = lax.psum(gsum, d_ax)
            grads = jax.tree_util.tree_map(
                lambda g: g / (G * iter_size), gsum)
            metrics = {k: v[None] for k, v in auxes.items()}   # (1, I)
            return grads, metrics
        return group_grads

    def step_fn(params, opt_state, rate, iteration, out_shape, data, scl,
                crp, gt, gt_mask, im_hw, valid_hw):
        assert data.shape[0] == G and data.shape[2] % n_sp == 0, (
            data.shape, G, n_sp)
        sharded = shard_map(
            make_group_grads(out_shape), mesh=mesh2d,
            in_specs=(P(),) + (P(d_ax),) * 7,
            out_specs=(P(), P(d_ax)),
            axis_names={d_ax}, check_vma=False)
        grads, metrics = sharded(params, data, scl, crp, gt, gt_mask,
                                 im_hw, valid_hw)
        new_params, new_state = solver_mod.apply_update(
            params, grads, opt_state, solver_type=solver_type, rate=rate,
            lr_mults=lr_mults, decay_mults=decay_mults,
            weight_decay=weight_decay, momentum=momentum,
            iteration=iteration)
        return new_params, new_state, metrics

    return jax.jit(
        step_fn, donate_argnums=(0, 1), static_argnums=(4,),
        in_shardings=(rep, rep, rep, rep, shard_data) + (shard_g,) * 6,
        out_shardings=(rep, rep, shard_g))


def _is_spatial_mesh(mesh):
    from smallhardface_tpu.parallel.mesh import SPATIAL_AXIS
    return mesh is not None and tuple(mesh.axis_names) == (SPATIAL_AXIS,)


def _is_group_mesh(mesh):
    from smallhardface_tpu.parallel.mesh import SPATIAL_AXIS
    return (mesh is not None
            and tuple(mesh.axis_names) == (DATA_AXIS, SPATIAL_AXIS))


def _snap(v, bucket):
    return int(math.ceil(max(v, 1) / bucket) * bucket)


def _snap_gt(g, buckets):
    for b in buckets:
        if g <= b:
            return b
    return buckets[-1]


def _batch_dims(samples):
    """Raw (pre-snap) max extents of a sample list — the quantities bucket
    shapes derive from. Multi-host training maxes these ACROSS processes
    so every controller compiles/runs the same program shape."""
    return np.array([
        max(s["height"] for s in samples),
        max(s["width"] for s in samples),
        max(s["data"].shape[0] for s in samples),
        max(s["data"].shape[1] for s in samples),
        max(max(s["gt_boxes"].shape[0] for s in samples), 1),
    ], np.int64)


def assemble_batch(samples, n_dev, iter_size, gt_buckets, raw_dims=None):
    """Pad a flat list of loader samples (n_dev*iter_size) to shared bucket
    shapes. `data` carries the distorted uint8 ORIGINALS (edge-padded so
    the fused device resize clamps at image borders like cv2); resize +
    crop happen on device via (im_scale, crop). Returns
    (arrays dict, im_idx list, bucket key).

    raw_dims overrides the measured extents (multi-host: the global max of
    every process's _batch_dims)."""
    if raw_dims is None:
        raw_dims = _batch_dims(samples)
    hmax, wmax = int(raw_dims[0]), int(raw_dims[1])
    # margin is 0 for training (mask_plan train=True keeps "where": the
    # band path's margin + dus backward cost more than they save here)
    margin = detector_mod.mask_plan(str(cfg.TPU.MASK_MODE), train=True)[1]
    hb = _snap(_snap(hmax, cfg.MAX_RESOLUTION) + margin, BUCKET)
    wb = _snap(_snap(wmax, cfg.MAX_RESOLUTION) + margin, BUCKET)
    h0max, w0max = int(raw_dims[2]), int(raw_dims[3])
    h0b, w0b = _snap(h0max, BUCKET), _snap(w0max, BUCKET)
    gmax = int(raw_dims[4])
    gb = _snap_gt(gmax, gt_buckets)

    data = np.zeros((n_dev, iter_size, h0b, w0b, 3), np.uint8)
    scale = np.ones((n_dev, iter_size), np.float32)
    crop = np.zeros((n_dev, iter_size, 2), np.float32)
    gt = np.zeros((n_dev, iter_size, gb, 5), np.float32)
    gt_mask = np.zeros((n_dev, iter_size, gb), bool)
    im_hw = np.zeros((n_dev, iter_size, 2), np.float32)
    valid_hw = np.zeros((n_dev, iter_size, 2), np.int32)
    im_idx = []
    for k, s in enumerate(samples):
        d, i = divmod(k, iter_size)
        h0, w0 = s["data"].shape[:2]
        data[d, i] = np.pad(s["data"],
                            ((0, h0b - h0), (0, w0b - w0), (0, 0)),
                            mode="edge")
        scale[d, i] = s["im_scale"]
        crop[d, i] = s["crop"]
        h, w = s["height"], s["width"]
        g = min(s["gt_boxes"].shape[0], gb)
        if s["gt_boxes"].shape[0] > gb:
            logger.warning("Truncating %d gt boxes to bucket %d",
                           s["gt_boxes"].shape[0], gb)
        gt[d, i, :g] = s["gt_boxes"][:g]
        gt_mask[d, i, :g] = True
        im_hw[d, i] = (h, w)
        valid_hw[d, i] = (
            _snap(h, cfg.MAX_RESOLUTION) // detector_mod.FEAT_STRIDE,
            _snap(w, cfg.MAX_RESOLUTION) // detector_mod.FEAT_STRIDE)
        im_idx.append(s["im_idx"])
    return ({"data": data, "scale": scale, "crop": crop, "gt": gt,
             "gt_mask": gt_mask, "im_hw": im_hw, "valid_hw": valid_hw},
            im_idx, (h0b, w0b, hb, wb, gb))


def _init_params(spec, pretrained_model):
    params = detector_mod.init_params(
        jax.random.PRNGKey(int(cfg.RNG_SEED)), spec)
    if pretrained_model and os.path.exists(str(pretrained_model)):
        logger.info("Loading pretrained model weights from %s",
                    pretrained_model)
        if str(pretrained_model).endswith(".caffemodel"):
            from smallhardface_tpu.io import caffemodel
            params = caffemodel.load_into_params(str(pretrained_model),
                                                 params)
        else:
            params = checkpoint.load_params(str(pretrained_model), params)
    elif pretrained_model:
        logger.warning("Pretrained model %s not found; training from "
                       "random init", pretrained_model)
    return params


def train_net(roidb, output_dir, pretrained_model, max_iter,
              mesh=None, progress_hook=None):
    """Train the detector; snapshots + final weights land in output_dir."""
    if str(cfg.TPU.PRECISION) == "int8":
        raise ValueError(
            "TPU.PRECISION='int8' is inference-only (dynamic rounding "
            "has no gradient); train with 'float32' or 'bfloat16'")
    spec = detector_mod.build_spec(cfg)
    tc = targets_mod.from_cfg(cfg)
    if mesh is None and cfg.PDB:
        # PDB debugging mode: single device, like the reference's forced
        # single-GPU unforked training (configs/default.toml:12)
        mesh = make_mesh(1)
    if mesh is None and int(cfg.TPU.SPATIAL_DEVICES) > 1:
        # spatial training: groups of SPATIAL_DEVICES chips each work on
        # ONE image's H shards (for resolutions whose activations exceed
        # a chip's HBM). With more devices than one group, the groups
        # stay data-parallel (make_train_step_grouped) — the same
        # two-axis semantics eval/serve give this knob — instead of
        # idling the surplus chips. Multi-host keeps the pure-spatial
        # mesh (grouped feeding is single-controller for now).
        from smallhardface_tpu.parallel.mesh import (make_spatial_mesh,
                                                     make_group_mesh,
                                                     maybe_init_distributed)
        maybe_init_distributed()
        k_sp = int(cfg.TPU.SPATIAL_DEVICES)
        n_all = len(jax.devices())
        if (jax.process_count() == 1 and n_all > k_sp
                and n_all % k_sp == 0):
            mesh = make_group_mesh(n_all // k_sp, k_sp)
        else:
            mesh = make_spatial_mesh(k_sp)
    mesh = mesh or make_mesh(int(cfg.TPU.NUM_DEVICES))
    spatial = _is_spatial_mesh(mesh)
    grouped = _is_group_mesh(mesh)
    n_dev = (1 if spatial
             else mesh.shape[DATA_AXIS] if grouped
             else mesh.devices.size)
    # Multi-controller topology: each process feeds ONLY the mesh rows its
    # addressable devices own (jax.make_array_from_process_local_data);
    # the reference's analog contract is one data layer per NCCL rank
    # (lib/train.py:58-63, parallel.cpp:303-316).
    n_procs = jax.process_count()
    proc = jax.process_index()
    if n_procs > 1 and grouped:
        raise NotImplementedError(
            "grouped spatial training (2-D data x sp mesh) is "
            "single-controller; multi-host runs use the pure-spatial "
            "mesh (train_net builds it automatically when "
            "TPU.SPATIAL_DEVICES is set) or plain DP")
    if n_procs > 1 and spatial:
        # ONE data rank, many controllers: every process runs the SAME
        # rank-0 loader (deterministic — RandomState(RNG_SEED + rank),
        # and mining feedback derives from the replicated metrics, so
        # the streams cannot diverge) and materializes only the H rows
        # of the batch its addressable devices own (put_named below).
        # The TPU analog of one data layer feeding a model-parallel
        # group.
        local_ranks = [0]
    elif n_procs > 1:
        mesh_devs = list(mesh.devices.flat)
        local_ranks = [i for i, d in enumerate(mesh_devs)
                       if d.process_index == proc]
        assert local_ranks and local_ranks == list(
            range(local_ranks[0], local_ranks[0] + len(local_ranks))), (
            f"non-contiguous local device block in mesh: {local_ranks}")
    else:
        local_ranks = list(range(n_dev))
    n_local = len(local_ranks)
    iter_size = int(cfg.TRAIN.ITERSIZE)
    gt_buckets = list(cfg.TPU.MAX_GT_BUCKETS)
    compute_dtype = (jnp.bfloat16 if cfg.TPU.PRECISION == "bfloat16"
                     else None)

    solver_type = str(cfg.TRAIN.SOLVER_TYPE)
    params = _init_params(spec, pretrained_model)
    opt_state = solver_mod.init_state(params, solver_type)
    start_iter = 0
    resume_extra = {}
    if cfg.TRAIN.RESUME:
        params, loaded_state, start_iter, resume_extra = checkpoint.load(
            cfg.TRAIN.RESUME)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        if loaded_state is not None:
            if "h1" not in loaded_state:     # pre-family checkpoints
                loaded_state = {"h1": loaded_state}
            loaded_state = jax.tree_util.tree_map(jnp.asarray, loaded_state)
            # reconcile slot layout with the configured solver family:
            # warm-start shared slots, zero-init missing ones
            if "h2" in opt_state and "h2" not in loaded_state:
                logger.warning(
                    "Checkpoint has one optimizer slot but %s needs two; "
                    "h2 starts from zeros", solver_type)
                loaded_state["h2"] = opt_state["h2"]
            if "h2" not in opt_state and "h2" in loaded_state:
                logger.warning(
                    "Dropping checkpoint's second optimizer slot for %s",
                    solver_type)
                loaded_state.pop("h2")
            opt_state = loaded_state
        logger.info("Resumed from %s at iter %d", cfg.TRAIN.RESUME,
                    start_iter)

    if start_iter >= max_iter:
        # Resume from a completed (or over-long) checkpoint: nothing to
        # train, but the final artifacts must still exist in THIS run's
        # output dir — the CLI wires cfg.TEST.MODEL to final.npz here,
        # and an auto-resume relaunch that crashed between the max_iter
        # snapshot and the test phase lands exactly on this path.
        logger.warning("Resume iteration %d >= max_iter %d: writing final "
                       "weights without training", start_iter, max_iter)
        if proc == 0:
            checkpoint.save(osp.join(output_dir, "final.npz"),
                            jax.device_get(params),
                            jax.device_get(opt_state), start_iter,
                            extra=resume_extra)
            from smallhardface_tpu.io import caffemodel
            caffemodel.export_params(
                osp.join(output_dir, "final.caffemodel"),
                jax.device_get(params))
        return params

    # Test-only fault injection: SHF_FAULT_ITER=K makes a FROM-SCRATCH run
    # raise a synthetic device-runtime fault at iteration K (resumed runs
    # are immune, so the relaunched process completes). Exercises
    # TRAIN.AUTO_RESUME end-to-end — tests/test_auto_resume.py.
    fault_iter = int(os.environ.get("SHF_FAULT_ITER", "0") or 0)

    step_maker = (make_train_step_grouped if grouped
                  else make_train_step_spatial if spatial
                  else make_train_step)
    step = step_maker(
        spec, tc, mesh, iter_size,
        weight_decay=float(cfg.TRAIN.WEIGHT_DECAY),
        momentum=float(cfg.TRAIN.MOMENTUM),
        compute_dtype=compute_dtype, solver_type=solver_type)

    if n_procs > 1:
        from jax.sharding import NamedSharding
        from smallhardface_tpu.parallel.mesh import SPATIAL_AXIS
        _rep_sharding = NamedSharding(mesh, P())
        _data_sharding = (
            NamedSharding(mesh, P(None, None, SPATIAL_AXIS)) if spatial
            else NamedSharding(mesh, P(DATA_AXIS)))

        def _replicated_global(tree):
            """Host tree → fully-replicated global arrays over the
            multi-process mesh (every rank holds identical solver state —
            the reference's DP invariant, parallel.cpp:303-316)."""
            def one(x):
                arr = np.asarray(jax.device_get(x))
                return jax.make_array_from_callback(
                    arr.shape, _rep_sharding, lambda idx, a=arr: a[idx])
            return jax.tree_util.tree_map(one, tree)

        params = _replicated_global(params)
        opt_state = _replicated_global(opt_state)

        def put(k, x):
            if spatial:
                # every process holds the identical full batch (same
                # rank-0 loader); the callback materializes only the
                # H shards (k == "data") or one replica this process's
                # devices address
                arr = np.asarray(x)
                sh = _data_sharding if k == "data" else _rep_sharding
                return jax.make_array_from_callback(
                    arr.shape, sh, lambda idx, a=arr: a[idx])
            return jax.make_array_from_process_local_data(_data_sharding, x)
    else:
        put = lambda k, x: jnp.asarray(x)   # noqa: E731

    def _local_rows(v):
        """Rows of a P(DATA_AXIS) output owned by this process, in global
        rank order (single-process: the whole array; spatial multi-host:
        metrics come out replicated — any addressable shard is the
        global value)."""
        if n_procs == 1:
            return np.asarray(v)
        if spatial:
            return np.asarray(v.addressable_shards[0].data)
        shards = sorted(v.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    # one loader per GLOBAL rank id hosted here: rank seeds the permutation,
    # so a 2-process×4-device run fetches exactly what 1×8 would
    loaders = [RoIDataLoader(roidb, rank=r) for r in local_ranks]
    if resume_extra.get("loader_state") is not None:
        import pickle
        states = pickle.loads(
            np.asarray(resume_extra["loader_state"]).tobytes())
        if (n_procs == 1 or spatial) and len(states) == n_dev:
            # spatial multi-host: every process runs the same single
            # rank-0 loader, so the one saved state restores everywhere
            for ld, st in zip(loaders, states):
                ld.load_state_dict(st)
            logger.info("Restored sampler state for %d ranks", n_dev)
        else:
            logger.warning(
                "Checkpoint sampler state has %d ranks but this run has %d "
                "(%d processes); samplers restart fresh",
                len(states), n_dev, n_procs)
    host_rng = np.random.RandomState(int(cfg.RNG_SEED))
    num_scales = len(cfg.TRAIN.SCALES.SHORT_SIDE)
    scale_seq = host_rng.randint(0, num_scales, size=max_iter)

    def _fetch_rank(r, scale_idx):
        # sequential within a rank (the reference's data layer was
        # single-threaded per rank); parallel across ranks
        return [loaders[r].get_minibatch(scale_idx)
                for _ in range(iter_size)]

    def build_batch(it):
        scale_idx = int(scale_seq[it])
        with ThreadPoolExecutor(max_workers=max(n_local, 1)) as ex:
            futs = [ex.submit(_fetch_rank, r, scale_idx)
                    for r in range(n_local)]
            samples = [s for f in futs for s in f.result()]
        if n_procs == 1:
            arrays, im_idx, bucket = assemble_batch(
                samples, n_local, iter_size, gt_buckets)
            # upload from the prefetch thread: H2D of the uint8 originals
            # (~30 MB/s through the tunnel — serialized it dominates the
            # iteration wall, tools/train_time.py) overlaps the previous
            # step's compute; device_put is thread-safe and the arrays
            # are consumed by the next step dispatch on the main thread
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            return arrays, im_idx, bucket
        # multi-host: bucket dims need a cross-process max (a collective);
        # issue it from the MAIN thread between steps, never from the
        # prefetch thread, so collective order is identical on every
        # process — return raw samples and assemble in finish_batch
        return samples

    def finish_batch(got):
        if n_procs == 1:
            return got
        from jax.experimental import multihost_utils
        # piggyback the process-local signal flags on the bucket-dims
        # allgather: a SIGINT/SIGHUP delivered to ONE process must act on
        # ALL of them, or the others deadlock in the next collective
        # (the reference's per-rank solvers shared the signal via the
        # controlling terminal's process group)
        msg = np.concatenate([
            _batch_dims(got),
            np.array([int(actions["stop"]), int(actions["snapshot"])],
                     np.int64)])
        gathered = np.max(multihost_utils.process_allgather(msg), axis=0)
        if gathered[-2]:
            agreed["stop"] = True
        # fresh each iteration: a gathered snapshot request is consumed
        # by this iteration's rank-0 write
        agreed["snapshot"] = bool(gathered[-1])
        # the local flag has been shipped to every process; clearing it
        # only now (not at the end of the iteration) means a SIGHUP that
        # lands between the will_snap decision and this gather still
        # reaches rank 0 instead of being silently dropped
        actions["snapshot"] = False
        return assemble_batch(got, n_local, iter_size, gt_buckets,
                              raw_dims=gathered[:-2])

    snapshot_prefix = cfg.NAME if cfg.TRAIN.SNAPSHOT_INFIX == "" else \
        f"{cfg.NAME}_{cfg.TRAIN.SNAPSHOT_INFIX}"

    # Signal-driven actions, polled once per iteration like the reference
    # solver loop (caffe/src/caffe/util/signal_handler.cpp:10-95,
    # solver.cpp:253-266): SIGINT → snapshot + stop, SIGHUP → snapshot.
    # `actions` is the process-LOCAL view the handler writes; under
    # multi-host the loop acts only on `agreed` (the allgathered max in
    # finish_batch) — acting on a local stop would exit this process one
    # iteration before its peers learn of it, deadlocking them in the
    # next collective, and clearing a local snapshot flag before it is
    # gathered would silently drop a SIGHUP delivered to a non-zero rank.
    actions = {"stop": False, "snapshot": False}
    agreed = {"stop": False, "snapshot": False}
    prev_handlers = {}

    def _on_signal(signum, frame):
        if signum == signal.SIGINT:
            actions["stop"] = True
            logger.warning("SIGINT received: stopping after this iteration "
                           "(snapshot will be written)")
        else:
            actions["snapshot"] = True
            logger.warning("SIGHUP received: snapshot at next iteration")

    try:
        for sig in (signal.SIGINT, signal.SIGHUP):
            prev_handlers[sig] = signal.signal(sig, _on_signal)
    except ValueError:
        prev_handlers = {}   # not on the main thread (e.g. under pytest)

    t = Timer()
    prefetch = ThreadPoolExecutor(max_workers=1)
    pending = prefetch.submit(build_batch, start_iter)
    # display-smoothed loss over the last 100 iterations, like the solver
    # template's average_loss (models/solver_template.prototxt:7,
    # caffe solver.cpp:474 UpdateSmoothedLoss)
    loss_window = deque(maxlen=100)
    # Depth-1 software pipeline (measured in tools/train_time.py /
    # PERF_NOTES r4): step N's dispatch is issued BEFORE step N-1's
    # metrics are read back, so the D2H readback (~1 tunnel RTT) and the
    # prefetch thread's H2D upload of batch N+1 both overlap step N's
    # compute. Consequence: mining feedback and loss logging run one
    # iteration behind the dispatch (marks are only consumed at epoch
    # reshuffle; snapshot iterations drain the pipeline first so the
    # captured sampler state carries every mark — see the will_snap
    # branch below). Processing the deferred record is also the pipeline
    # throttle — it blocks until step N-1 is done, so the host can never
    # run more than one step ahead (bounded device memory).
    deferred = None          # (it1, device metrics, im_idx, rate, bucket)

    def process_metrics(rec):
        it1, metrics_dev, m_idx, m_rate, m_bucket = rec
        metrics = _unpack_metrics(_local_rows(metrics_dev))
        # hard-image mining feedback
        if cfg.TRAIN.DISABLE_EASY_IMAGE.ENABLE:
            easy = metrics["easy"].reshape(-1)
            for k, flag in enumerate(easy):
                if flag:
                    d, _ = divmod(k, iter_size)
                    loaders[d].mark_easy(m_idx[k])
        loss_window.append(float(metrics["cls_loss"].mean()) +
                           float(metrics["reg_loss"].mean()))
        if it1 % 20 == 0 or it1 == max_iter or it1 == start_iter + 1:
            cls_l = float(metrics["cls_loss"].mean())
            reg_l = float(metrics["reg_loss"].mean())
            smoothed = sum(loss_window) / len(loss_window)
            acc = float(metrics["accuracy"].mean())
            eta = int((max_iter - it1) * t.average_time)
            logger.info(
                "iter %d/%d cls_loss: %.5f reg_loss: %.5f "
                "smoothed_loss: %.5f accuracy: %.5f "
                "lr: %.2e bucket: %s speed: %.3f iter/s ETA: %s",
                it1, max_iter, cls_l, reg_l, smoothed, acc, m_rate,
                m_bucket, 1.0 / max(t.average_time, 1e-9),
                str(datetime.timedelta(seconds=eta)))
            tb.sess.add_scalar_value("cls_loss", cls_l, step=it1)
            tb.sess.add_scalar_value("reg_loss", reg_l, step=it1)
            tb.sess.add_scalar_value("target_layer_accuracy", acc, step=it1)
            tb.sess.add_scalar_value("speed", 1.0 / max(t.average_time,
                                                        1e-9), step=it1)
            tb.sess.add_scalar_value("ETA (min)", eta / 60.0, step=it1)
        if progress_hook is not None:
            progress_hook(it1, metrics)

    for it in range(start_iter, max_iter):
        t.tic()
        batch, im_idx, bucket = finish_batch(pending.result())
        it1 = it + 1
        if fault_iter and it1 == fault_iter and start_iter == 0:
            raise jax.errors.JaxRuntimeError(
                "UNAVAILABLE: injected TPU worker fault (SHF_FAULT_ITER)")
        # Snapshot/stop decision up front (multi-host: the allgather-
        # agreed flags finish_batch just refreshed). A signal landing
        # later in this iteration acts at the NEXT one — the same
        # "snapshot at next iteration" semantics, now race-free against
        # the snapshot write below.
        eff = actions if n_procs == 1 else agreed
        will_stop = bool(eff["stop"])
        # pop = atomic read-and-clear w.r.t. the signal handler (one C
        # call; the handler re-creates the key), so a SIGHUP landing
        # mid-decision is never silently dropped
        snap_req = bool(eff.pop("snapshot", False))
        will_snap = (it1 % int(cfg.TRAIN.SNAPSHOT) == 0
                     or it1 == max_iter or snap_req or will_stop)
        if not will_snap:
            # Sampler snapshot BEFORE the next prefetch mutates loader
            # state: a resume at iteration it+1 re-fetches exactly the
            # batch the original run would have used for it+1. (Snapshot
            # iterations capture later — after draining the in-flight
            # metrics — see below.)
            loader_snapshot = [ld.state_dict() for ld in loaders]
            if it + 1 < max_iter:
                pending = prefetch.submit(build_batch, it + 1)
        rate = solver_mod.learning_rate(it, cfg)
        out_shape = (bucket[2], bucket[3])        # (hb, wb)
        if n_procs == 1:
            dev_args = (batch["data"], batch["scale"], batch["crop"],
                        batch["gt"], batch["gt_mask"], batch["im_hw"],
                        batch["valid_hw"])       # uploaded by the prefetch
        else:
            dev_args = tuple(put(k, batch[k]) for k in (
                "data", "scale", "crop", "gt", "gt_mask", "im_hw",
                "valid_hw"))
        params, opt_state, metrics_dev = step(
            params, opt_state, np.float32(rate), np.int32(it), out_shape,
            *dev_args)
        metrics_dev = _pack_metrics(metrics_dev)   # one D2H array, not 5
        if deferred is not None:
            process_metrics(deferred)
            deferred = None
        if will_snap:
            # Snapshot iteration: stall the pipeline — drain THIS step's
            # metrics too (blocking readback), so every easy-image mark
            # for iterations ≤ it1 is applied before the sampler state is
            # captured. This closes the mining-resume caveat (a resumed
            # run used to lose the marks of the two in-flight iterations
            # and could diverge at the first epoch boundary). Costs one
            # overlap-free iteration per snapshot.
            process_metrics((it1, metrics_dev, im_idx, rate, bucket))
            loader_snapshot = [ld.state_dict() for ld in loaders]
            if it + 1 < max_iter and not will_stop:
                # a stop-signal iteration breaks below; don't waste a
                # batch fetch/upload during shutdown
                pending = prefetch.submit(build_batch, it + 1)
        else:
            deferred = (it1, metrics_dev, im_idx, rate, bucket)
        t.toc()

        if will_snap and proc != 0:
            # single-writer snapshots, like the reference's rank-0-only
            # snapshotting (lib/train.py:143-146); params are replicated
            # so process 0's copy is every process's copy
            pass
        elif will_snap:
            import pickle
            if n_procs > 1 and not spatial:
                # process 0 only holds its own ranks' sampler state; a
                # resume restarts samplers (warned at load). Spatial
                # multi-host has ONE (identical-everywhere) rank-0
                # loader, so its state IS the global sampler state.
                extra = {}
            else:
                extra = {"loader_state": np.frombuffer(
                    pickle.dumps(loader_snapshot), dtype=np.uint8)}
            fname = osp.join(output_dir,
                             f"{snapshot_prefix}_iter_{it1}.npz")
            checkpoint.save(fname, jax.device_get(params),
                            jax.device_get(opt_state), it1, extra=extra)
            if it1 == max_iter:
                checkpoint.save(osp.join(output_dir, "final.npz"),
                                jax.device_get(params),
                                jax.device_get(opt_state), it1, extra=extra)
                from smallhardface_tpu.io import caffemodel
                caffemodel.export_params(
                    osp.join(output_dir, "final.caffemodel"),
                    jax.device_get(params))

        if will_stop:
            logger.warning("Stopping at iteration %d on signal", it1)
            break

    if deferred is not None:
        process_metrics(deferred)     # flush the pipelined last iteration
    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    prefetch.shutdown(wait=False)
    logger.info("done solving!")
    return params
