#!/usr/bin/env python3
"""End-to-end learning proof: train → final.npz → test → WIDER-protocol AP.

Builds a tiny synthetic WIDER-format dataset, runs the REAL CLI
(`train_test.py --train true --test true`) from random init on a virtual
multi-device CPU mesh, and asserts the trained detector reaches AP > 0.95
on its own training images under the full WIDER evaluation protocol
(detections.pkl → per-image txt → wider_eval PR/AP).

This closes the gap between "loss decreases" and "the detector works":
the whole stack — loader, fused device preprocessing, anchor targets +
OHEM, shard_map DP gradients, Caffe SGD, checkpoints, fused pyramid
inference, decode, bbox vote, dataset writers, WIDER eval — runs through
its production entry points. Reference contract:
/root/reference/lib/train.py:230 + lib/wider_eval_tools/wider_eval.py:175-222.

Usage: python scripts/overfit_check.py [--iters 300] [--ndev 2] [--tpu]
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
sys.path.insert(0, os.path.join(REPO, "scripts"))

AP_RE = re.compile(
    r"Easy: ([0-9.]+), Medium: ([0-9.]+), Hard: ([0-9.]+)")


def run(iters=300, n_dev=2, im_size=192, use_tpu=False, keep_output=False,
        verbose=True, extra_amends=()):
    """Returns (easy, medium, hard) AP floats."""
    import synth_wider

    data_dir = tempfile.mkdtemp(prefix="synth_wider_")
    synth_wider.build(data_dir, n_images=4, im_size=im_size,
                      faces_per_image=2, seed=0)

    env = dict(os.environ)
    if not use_tpu:
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        flags = " ".join(
            f for f in flags.split()
            if "xla_force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{max(n_dev, 2)}").strip()
    name = "overfit_check"
    out_root = tempfile.mkdtemp(prefix="overfit_out_")
    cmd = [
        sys.executable, "train_test.py",
        "--train", "true", "--test", "true",
        "--conf", "smallhardface_tpu/configs/smallhardface.toml",
        "--amend",
        "ROOT_DIR", out_root,
        "DATA_DIR", data_dir,
        "NAME", name,
        "EXP_DIR", "synth",
        "TRAIN.ITERS", str(iters),
        "TRAIN.SNAPSHOT", str(iters),
        "TRAIN.ITERSIZE", "1",
        "TRAIN.SCALES.SHORT_SIDE", f"[{im_size}]",
        "TRAIN.AUGMENT.ENABLE", "False",
        "TRAIN.DISABLE_EASY_IMAGE.ENABLE", "False",
        "TRAIN.LR.BASELR", "0.001",
        "TRAIN.STEPSIZE", str(max(iters * 2 // 3, 1)),
        "TRAIN.PRETRAINED", "",
        "TPU.NUM_DEVICES", str(n_dev),
        "TEST.SCALES", f"[{im_size}]",
        "TEST.MAX_SIZE", str(2 * im_size),
        *extra_amends,
    ]
    # ROOT_DIR is amended to the scratch dir so artifacts stay out of the
    # real output/ tree; the CLI itself runs from the repo
    proc = subprocess.run(cmd, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=7200)
    logs = glob.glob(os.path.join(
        out_root, "output", "synth", "*", f"{name}_*", "stderr.log"))
    log_text = ""
    for lg in logs:
        with open(lg) as f:
            log_text += f.read()
    if proc.returncode != 0:
        raise RuntimeError(
            f"CLI failed rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}"
            f"\nstderr:\n{proc.stderr[-3000:]}\nlog:\n{log_text[-5000:]}")
    m = None
    for m in AP_RE.finditer(log_text):
        pass
    if m is None:
        raise RuntimeError(
            f"No AP line found in logs\nlog:\n{log_text[-5000:]}")
    aps = tuple(float(g) for g in m.groups())
    if verbose:
        tail = [ln for ln in log_text.splitlines()
                if "iter " in ln or "Easy:" in ln]
        print("\n".join(tail[-12:]))
        print(f"AP easy/medium/hard = {aps}")
    if not keep_output:
        import shutil
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(out_root, ignore_errors=True)
    return aps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--ndev", type=int, default=2)
    ap.add_argument("--im-size", type=int, default=192)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) platform instead of "
                    "forcing a virtual CPU mesh")
    ap.add_argument("--amend", nargs="*", default=[],
                    help="extra KEY VALUE pairs appended to the CLI's "
                    "--amend list (e.g. TPU.PALLAS_STEM_TRAIN True)")
    args = ap.parse_args()
    aps = run(iters=args.iters, n_dev=args.ndev, im_size=args.im_size,
              use_tpu=args.tpu, extra_amends=tuple(args.amend))
    assert min(aps) > 0.95, f"overfit check FAILED: AP={aps}"
    print(f"OVERFIT CHECK PASSED: AP={aps}")


if __name__ == "__main__":
    main()
