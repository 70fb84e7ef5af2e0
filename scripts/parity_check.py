#!/usr/bin/env python3
"""Device-path vs reference-exact-path parity, in one command.

Runs the production CLI eval twice on the same weights and dataset —
(1) the fused device pipeline (device preprocessing + device bbox_vote,
the default) and (2) `TPU.HOST_PREPROC=true` (cv2 resize, float32
uploads, float64 host vote — bit-matching the reference pipeline,
/root/reference/lib/test.py:109-217) — then compares the WIDER result
artifacts with tools.compare_dets and prints both APs.

With no WIDER data on disk, builds the synthetic dataset from
scripts/synth_wider.py. Round-2 result on trained weights
(SCHEDULE_RUN.md): 0.998 mean match rate, AP 1.0/1.0/1.0 on both paths.

Usage: python scripts/parity_check.py --model /path/to/weights.npz
           [--data /path/to/WIDER_FACE] [--n-images 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AP_RE = re.compile(r"Easy: ([0-9.]+), Medium: ([0-9.]+), Hard: ([0-9.]+)")


def run_eval(model, data_dir, exp_dir, extra):
    cmd = [sys.executable, "train_test.py", "--train", "false",
           "--test", "true",
           "--conf", "smallhardface_tpu/configs/smallhardface.toml",
           "--amend", "DATA_DIR", data_dir, "TEST.MODEL", model,
           "EXP_DIR", exp_dir] + extra
    subprocess.run(cmd, cwd=REPO, check=True)
    out = sorted(glob.glob(
        os.path.join(REPO, "output", exp_dir, "wider_val", "*")))[-1]
    log = open(os.path.join(out, "stderr.log")).read()
    m = AP_RE.findall(log)
    ap = tuple(float(v) for v in m[-1]) if m else None
    return os.path.join(out, "result.tar.gz"), ap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--data", default="")
    ap.add_argument("--n-images", type=int, default=40)
    ap.add_argument("--ab", nargs="*", default=None,
                    help="A/B mode: compare the default device path "
                    "against the device path with these extra KEY VALUE "
                    "amends (e.g. --ab TPU.PRECISION int8 TPU.MASK_MODE "
                    "exact) instead of against the host-preproc path")
    args = ap.parse_args()

    data = args.data
    if not data:
        data = tempfile.mkdtemp(prefix="synth_wider_parity_")
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        import synth_wider
        synth_wider.build(data, n_images=args.n_images, im_size=512,
                          faces_per_image=3, seed=0)
        print(f"# built synthetic WIDER at {data}")

    tar_dev, ap_dev = run_eval(args.model, data, "paritychk_dev", [])
    if args.ab is not None:
        tar_b, ap_b = run_eval(args.model, data, "paritychk_ab",
                               list(args.ab))
        print(f"device path AP:          {ap_dev}")
        print(f"device path AP (amended): {ap_b}  [{' '.join(args.ab)}]")
        subprocess.run([sys.executable, "-m",
                        "smallhardface_tpu.tools.compare_dets",
                        tar_dev, tar_b], cwd=REPO, check=True)
        return
    tar_host, ap_host = run_eval(args.model, data, "paritychk_host",
                                 ["TPU.HOST_PREPROC", "True"])
    print(f"device path AP: {ap_dev}")
    print(f"host   path AP: {ap_host}")
    subprocess.run([sys.executable, "-m",
                    "smallhardface_tpu.tools.compare_dets",
                    tar_dev, tar_host], cwd=REPO, check=True)


if __name__ == "__main__":
    main()
