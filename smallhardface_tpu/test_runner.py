"""Dataset evaluation orchestration (reference /root/reference/lib/test.py:
220-372): shard images over devices, run per-image pyramid detection,
cache `detections.pkl`, then hand off to the dataset's evaluator.

The reference forked one process per GPU and gathered via a Queue
(lib/test.py:319-344); on TPU each local device gets a worker thread with
its own replicated params — XLA dispatch releases the GIL so device work
overlaps, and host-side merge/vote overlaps compute across workers.
"""

from __future__ import annotations

import logging
import os
import pickle
from concurrent.futures import ThreadPoolExecutor

import cv2
import numpy as np
import jax

from smallhardface_tpu.config import cfg
from smallhardface_tpu.detect import TPUDetector
from smallhardface_tpu.models import detector as detector_mod
from smallhardface_tpu.utils.timer import Timer
from smallhardface_tpu.utils.tensorboard import tb

logger = logging.getLogger(__name__)


def _load_params(spec):
    """Resolve TEST.MODEL into a param pytree: .caffemodel or native .npz."""
    import jax.random as jrandom
    params = detector_mod.init_params(jrandom.PRNGKey(cfg.RNG_SEED), spec)
    path = cfg.TEST.MODEL
    if not path:
        logger.warning("TEST.MODEL is empty; using random-init weights")
        return params
    if path.endswith(".caffemodel"):
        from smallhardface_tpu.io import caffemodel
        return caffemodel.load_into_params(path, params)
    from smallhardface_tpu.io import checkpoint
    return checkpoint.load_params(path, params)


def inference_worker(rank, device, imdb, params, spec, start, end, thresh):
    """Per-device worker with a depth-2 pipeline: image i+1 is uploaded and
    dispatched while image i's results are read back and voted on the host
    (the async-dispatch analog of the reference's prefetching data layers).

    `device` is a single jax.Device, or a jax.sharding.Mesh when
    TPU.SPATIAL_DEVICES > 1 — then this worker's images each run
    H-sharded across the mesh's devices (detect.TPUDetector
    spatial_mesh semantics; detections match single-device to last-ulp
    float reassociation around the halo exchanges)."""
    if isinstance(device, jax.sharding.Mesh):
        det = TPUDetector(params, spec, spatial_mesh=device)
    else:
        det = TPUDetector(params, spec, device=device)
    if det.compute_dtype == "int8":
        # static quantization: calibrate activation ranges on the first
        # few images of this worker's shard (one-time, before the timed
        # loop) — without this the forward falls back to dynamic
        # per-tensor scales, which are ~2x slower (PERF_NOTES)
        n_cal = min(int(cfg.TPU.INT8_CALIB_IMAGES), end - start)
        if n_cal > 0:
            det.calibrate_int8(
                [imdb.image_path_at(i) for i in range(start, start + n_cal)])
    timers = {"detect": Timer(), "misc": Timer()}
    dets = [[[] for _ in range(start, end)]
            for _ in range(imdb.num_classes)]
    pipelined = not det.host_preproc

    def store(i, dets_):
        for c in range(imdb.num_classes - 1):
            dets[c + 1][i - start] = dets_[c]
        if rank == 0 and (i - start) % 20 == 0:
            done = i + 1 - start
            total = end - start
            avg = timers["detect"].average_time + timers["misc"].average_time
            logger.info(
                "%02d%% detect-time: %.3fs, misc-time: %.3fs, "
                "remain-time: %.1fs",
                int(100 * done / total), timers["detect"].average_time,
                timers["misc"].average_time, (total - done) * avg)
            tb.sess.add_scalar_value(
                "detect-time", timers["detect"].average_time, step=i - start)

    eval_batch = int(cfg.TPU.EVAL_BATCH)
    if eval_batch > 1 and det.spatial_mesh is not None:
        if rank == 0:
            logger.warning(
                "TPU.EVAL_BATCH=%d ignored under TPU.SPATIAL_DEVICES: "
                "detect_many batches per chip; spatial groups run the "
                "per-image pipeline", eval_batch)
        eval_batch = 1
    if pipelined and eval_batch > 1:
        # batched mode: same-bucket images share one device dispatch
        # (detect_many); bounded program count because only full batches
        # of exactly eval_batch run batched — leftovers go one-at-a-time
        buckets = {}
        leftovers = []
        for i in range(start, end):
            im = cv2.imread(imdb.image_path_at(i))
            key = det._prep(im)["key"]
            buckets.setdefault(key, []).append((i, im))
            if len(buckets[key]) == eval_batch:
                group = buckets.pop(key)
                timers["detect"].tic()
                results = det.detect_many([m for _, m in group], thresh)
                timers["detect"].toc()
                for (j, _), res in zip(group, results):
                    store(j, res)
        for group in buckets.values():
            leftovers.extend(group)
        for j, im in leftovers:
            timers["detect"].tic()
            handle = det.detect_async(im, thresh)
            timers["detect"].toc()
            timers["misc"].tic()
            store(j, det.finalize_async(handle, thresh))
            timers["misc"].toc()
    elif pipelined:
        from collections import deque
        depth = 3           # images in flight on the device
        pending = deque()   # (image index, device handle)
        for i in range(start, end):
            timers["detect"].tic()
            handle = det.detect_async(imdb.image_path_at(i), thresh)
            timers["detect"].toc()
            pending.append((i, handle))
            if len(pending) > depth:
                j, h = pending.popleft()
                timers["misc"].tic()
                store(j, det.finalize_async(h, thresh))
                timers["misc"].toc()
        while pending:
            j, h = pending.popleft()
            store(j, det.finalize_async(h, thresh))
    else:
        for i in range(start, end):
            dets_, _ = det.detect(imdb.image_path_at(i), thresh,
                                  timers=timers)
            store(i, dets_)
    return rank, dets


def _process_range(n_total):
    """Contiguous image block owned by this controller — the multi-host
    analog of the reference's worker sharding (lib/test.py:319-344
    sharded images over forked GPU workers and reordered via a Queue;
    here processes own blocks and an allgather reorders)."""
    n_procs = jax.process_count()
    per = int(np.ceil(n_total / max(n_procs, 1)))
    p0 = per * jax.process_index()
    return min(p0, n_total), min(p0 + per, n_total)


def _allgather_detections(dets_local, num_classes):
    """Exchange each process's detection block; every controller returns
    the full imdb-ordered list. Detections are ragged → pickle to bytes,
    pad to the global max, one allgather (+ one for the lengths)."""
    from jax.experimental import multihost_utils
    payload = np.frombuffer(
        pickle.dumps(dets_local, pickle.HIGHEST_PROTOCOL), np.uint8)
    lens = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    lens = np.asarray(lens).reshape(-1)
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    parts = [pickle.loads(gathered[p, :int(lens[p])].tobytes())
             for p in range(len(lens))]
    return [[im_dets for part in parts for im_dets in part[c]]
            for c in range(num_classes)]


def run_inference(imdb, params, spec, thresh):
    devices = jax.local_devices()
    k = int(cfg.TPU.SPATIAL_DEVICES)
    if k > 1:
        # two-axis eval: groups of k devices each run one image H-sharded
        # (spatial axis), the groups data-parallel over the image shard
        if len(devices) % k != 0:
            raise ValueError(
                f"TPU.SPATIAL_DEVICES={k} must divide the local device "
                f"count ({len(devices)})")
        from smallhardface_tpu.parallel.mesh import SPATIAL_AXIS
        from jax.sharding import Mesh
        units = [Mesh(np.array(devices[g * k:(g + 1) * k]), (SPATIAL_AXIS,))
                 for g in range(len(devices) // k)]
    else:
        units = devices
    # multi-controller: this process evaluates only its contiguous block;
    # the allgather below restores full imdb order on every process
    p_start, p_end = _process_range(len(imdb))
    n_images = p_end - p_start
    n_workers = max(1, min(len(units), n_images))
    len_per = int(np.ceil(max(n_images, 1) / n_workers))
    shards = [(r, units[r], p_start + len_per * r,
               min(p_start + len_per * (r + 1), p_end))
              for r in range(n_workers)]
    shards = [s for s in shards if s[3] > s[2]]
    if len(shards) == 1:
        results = [inference_worker(0, shards[0][1], imdb, params, spec,
                                    shards[0][2], shards[0][3], thresh)]
    elif shards:
        with ThreadPoolExecutor(max_workers=len(shards)) as pool:
            futs = [
                pool.submit(inference_worker, r, d, imdb, params, spec,
                            s, e, thresh)
                for r, d, s, e in shards
            ]
            results = [f.result() for f in futs]
    else:
        results = []    # more processes than images: empty local block
    results.sort(key=lambda x: x[0])
    dets_local = [[im_dets for _, shard in results for im_dets in shard[c]]
                  for c in range(imdb.num_classes)]
    if jax.process_count() == 1:
        return dets_local
    return _allgather_detections(dets_local, imdb.num_classes)


def demo(params, spec, thresh):
    """Single-image demo: draw rectangles on TEST.DEMO.IMAGE →
    /tmp/demo_res.jpg (reference lib/test.py:270-287)."""
    det = TPUDetector(params, spec)
    im_path = cfg.TEST.DEMO.IMAGE
    dets, _ = det.detect(im_path, thresh)
    im = cv2.imread(im_path)
    for i in range(dets[0].shape[0]):
        if dets[0][i, -1] < thresh:
            continue
        cv2.rectangle(im, (int(dets[0][i, 0]), int(dets[0][i, 1])),
                      (int(dets[0][i, 2]), int(dets[0][i, 3])),
                      (0, 255, 0), 2)
    cv2.imwrite("/tmp/demo_res.jpg", im)
    logger.info("Demo result written to /tmp/demo_res.jpg "
                "(%d detections)", dets[0].shape[0])
    return None


def get_testing_roidb(imdb):
    """Prepare the testing roidb. Public-API parity with the reference's
    helper (lib/test.py:359-371), which its own driver likewise never
    calls — evaluation reads images by path and needs no roidb. Kept for
    users who called it directly."""
    logger.info("Preparing testing data...")
    imdb.prepare_roidb()
    logger.info("done")
    return imdb.roidb


def test_net(imdb, output_dir, thresh=0.05, no_cache=False, step=0,
             params=None, spec=None):
    # pod launches reach eval without a prior training mesh: pick up the
    # env-driven multi-controller init here too (no-op on single host)
    from smallhardface_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    if cfg.TEST.LEVEL:
        # The shipped templates emit one proposal module; per-level
        # selection (lib/test.py:71-75) only applies to multi-module
        # surgery models.
        logger.warning("TEST.LEVEL=%s ignored: the different-dilation "
                       "model has a single proposal module",
                       cfg.TEST.LEVEL)
    spec = spec or detector_mod.build_spec(cfg)
    if params is None:
        params = _load_params(spec)
    if imdb is None:
        assert cfg.TEST.DEMO.ENABLE, "check your config and stderr!"
        return demo(params, spec, thresh)
    logger.info("Evaluating %s on %s", cfg.NAME, imdb.name)

    # Multi-controller: process 0 is the single reader/writer of
    # detections.pkl and the single evaluator (the reference's parent
    # process gathered worker queues and wrote once, lib/test.py:319-358);
    # every process must agree on whether inference runs, or the ranks
    # that skip it deadlock the others in the detection allgather.
    n_procs = jax.process_count()
    proc = jax.process_index()
    dets = None
    det_file = os.path.join(output_dir, "detections.pkl")
    if proc == 0 and not no_cache and os.path.exists(det_file):
        try:
            with open(det_file, "rb") as f:
                dets = pickle.load(f)
            logger.info("Loading detections from cache: %s", det_file)
        except Exception:
            logger.warning("Could not load the cached detections file, "
                           "detecting from scratch!")
    cache_hit = dets is not None
    if n_procs > 1:
        from jax.experimental import multihost_utils
        cache_hit = bool(np.asarray(multihost_utils.broadcast_one_to_all(
            np.array([cache_hit], np.int32))).reshape(-1)[0])

    if not cache_hit:
        if (os.environ.get("SHF_FAULT_TEST") == "1"
                and "SHF_AUTO_RESUME_LEFT" not in os.environ):
            # test-only fault injection: the FIRST process (no relaunch
            # marker in the env yet) dies with a synthetic device-runtime
            # fault; the TRAIN.AUTO_RESUME relaunch, which carries the
            # marker, completes — tests/test_auto_resume.py
            raise jax.errors.JaxRuntimeError(
                "UNAVAILABLE: injected TPU worker fault (SHF_FAULT_TEST)")
        dets = run_inference(imdb, params, spec, thresh)
        assert len(dets[0]) == len(imdb), "Detection result compromised"
        if proc == 0 and not no_cache:
            with open(det_file, "wb") as f:
                pickle.dump(dets, f, pickle.HIGHEST_PROTOCOL)

    if proc != 0:
        logger.info("Process %d: detections gathered to rank 0; skipping "
                    "cache write and evaluation (single-writer)", proc)
        return None
    logger.info("Evaluating detections")
    result = imdb.evaluate_detections(
        all_boxes=dets, output_dir=output_dir, method_name=cfg.NAME,
        step=step)
    logger.info(result)
    logger.info("All Done!")
    return result
