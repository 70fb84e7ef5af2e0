#!/usr/bin/env python3
"""Benchmark: full-pyramid WIDER-style eval throughput on the local chip(s).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol: the reference test protocol (TEST.SCALES=[100,300,600,1000,1400]
on PYRAMID_BASE_SIZE [800,1200], flip TTA, on-device decode, host vote)
on representative 1024×768-class images. If WIDER val is present on disk it
uses real images; otherwise synthetic images of typical WIDER sizes.

vs_baseline: the reference published no throughput; BASELINE.json targets
≥5× the 4-GPU reference eval throughput on a v5e-8. We estimate the
reference at 0.75 img/s aggregate over 4 Titan-class GPUs for the full
pyramid+flip protocol (12 forwards + host NMS per image), i.e.
0.1875 img/s/GPU. vs_baseline reports measured img/s/chip divided by that
per-device estimate.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_IMG_PER_SEC_PER_GPU = 0.1875


def _images():
    """Real WIDER val images if present, else synthetic at WIDER-like sizes."""
    from smallhardface_tpu.config import cfg
    import glob
    wider_val = os.path.join(cfg.DATA_DIR, "WIDER_val", "images")
    if os.path.isdir(wider_val):
        paths = sorted(glob.glob(os.path.join(wider_val, "*", "*.jpg")))[:32]
        if paths:
            import cv2
            return [cv2.imread(p) for p in paths]
    rng = np.random.RandomState(0)
    sizes = [(768, 1024), (1024, 768), (683, 1024), (1024, 1530)]
    return [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for h, w in sizes * 3]


def main():
    t_setup = time.time()
    import jax
    from smallhardface_tpu.config import cfg, cfg_from_file
    conf = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "smallhardface_tpu", "configs", "smallhardface.toml")
    cfg_from_file(conf)
    from smallhardface_tpu.models import detector as dm
    from smallhardface_tpu.detect import TPUDetector

    spec = dm.build_spec(cfg)
    params = dm.init_params(jax.random.PRNGKey(3), spec)
    # Random-init weights score every anchor ≈0.5, which floods the host
    # vote stage with 120k degenerate detections per image. Bias the class
    # heads toward background so the detection count matches a trained
    # model's regime (the device-side work — 12 forwards + decode + top-k
    # per image — is identical either way).
    import jax.numpy as jnp
    for k in (1, 2, 4):
        params[f"cls_score_{k}"]["b"] = jnp.asarray([5.0, -5.0])
    det = TPUDetector(params, spec)

    imgs = _images()

    # Warm-up: compile every pyramid bucket (one pass over each distinct
    # image shape) + absorb the first device→host readback (pathologically
    # slow through the axon tunnel).
    seen = set()
    for im in imgs:
        if im.shape not in seen:
            seen.add(im.shape)
            det.detect(im, thresh=0.05)
    n_prog = len(det._compiled) + len(det._compiled_dev)
    print(f"# setup+warmup {time.time() - t_setup:.1f}s "
          f"({n_prog} programs)", file=sys.stderr)

    n_chips = jax.local_device_count()
    from collections import deque
    t0 = time.time()
    n_done = 0
    pending = deque()
    # depth-3 pipeline, same pattern as test_runner.inference_worker
    for im in imgs:
        pending.append(det.detect_async(im, thresh=0.05))
        if len(pending) > 3:
            det.finalize_async(pending.popleft(), thresh=0.05)
            n_done += 1
    while pending:
        det.finalize_async(pending.popleft(), thresh=0.05)
        n_done += 1
    elapsed = time.time() - t0
    img_per_sec = n_done / elapsed
    img_per_sec_per_chip = img_per_sec / max(n_chips, 1)

    print(json.dumps({
        "metric": "WIDER-val full-pyramid eval throughput (img/s/chip)",
        "value": round(img_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            img_per_sec_per_chip / REFERENCE_IMG_PER_SEC_PER_GPU, 3),
    }))


if __name__ == "__main__":
    main()
