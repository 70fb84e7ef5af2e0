"""One-command WIDER AP parity harness (VERDICT r4 item 6).

When real WIDER data and the reference's trained `final.caffemodel` land
on a machine, proving AP parity against the published numbers
(/root/reference/README.md:5-7: 95.7/94.9/89.7) is ONE command:

  python -m smallhardface_tpu.tools.ap_parity <wider_root> <weights>

It (1) validates the WIDER layout, (2) loads the weights with a
matched/unmatched layer report (fast-fail before the long evals),
(3) runs the production CLI eval TWICE — the fused device path (default)
and `TPU.HOST_PREPROC=true` (cv2 resize, float32 uploads, float64 host
vote — the reference-exact pipeline, /root/reference/lib/test.py:109-217)
— and (4) prints both AP triples plus the compare_dets match table
between the two result artifacts.

<wider_root> layout (the reference run recipe, README.md:93-99):
  WIDER_val/images/<event>/<img>.jpg
  wider_face_split/wider_face_val_bbx_gt.txt
  ground_truth/wider_face_val.mat (+ easy/medium/hard setting mats)
<weights>: a .caffemodel (reference trained model) or a native .npz.

--dry-run: no data/weights needed — builds the synthetic WIDER layout
(scripts/synth_wider.py) and, when <weights> is the literal `synth`,
a random-init .caffemodel fixture, so the whole harness is exercisable
on any machine (tests/test_bench_datasets-style CPU run; routine test in
tests/test_ap_parity.py).
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
AP_RE = re.compile(r"Easy: ([0-9.]+), Medium: ([0-9.]+), Hard: ([0-9.]+)")

_LAYOUT = (
    os.path.join("WIDER_val", "images"),
    os.path.join("wider_face_split", "wider_face_val_bbx_gt.txt"),
    os.path.join("ground_truth", "wider_face_val.mat"),
    os.path.join("ground_truth", "wider_easy_val.mat"),
    os.path.join("ground_truth", "wider_medium_val.mat"),
    os.path.join("ground_truth", "wider_hard_val.mat"),
)


def validate_layout(root):
    missing = [p for p in _LAYOUT
               if not os.path.exists(os.path.join(root, p))]
    if missing:
        raise SystemExit(
            f"{root} is not a WIDER layout — missing: {missing}\n"
            "expected the reference's on-disk structure "
            "(/root/reference/README.md:93-99): WIDER_val/images/, "
            "wider_face_split/wider_face_val_bbx_gt.txt, "
            "ground_truth/*.mat")


def weights_report(path):
    """Load the weights into a fresh param tree and report coverage —
    fails fast (before two long evals) on an unreadable/mismatched file."""
    import jax

    from smallhardface_tpu.config import cfg
    from smallhardface_tpu.models import detector as dm

    spec = dm.build_spec(cfg)
    params = dm.init_params(jax.random.PRNGKey(0), spec)
    if path.endswith(".caffemodel"):
        from smallhardface_tpu.io import caffemodel
        file_layers = caffemodel.read_caffemodel(path)
        caffemodel.load_into_params(path, params, strict=True,
                                    file_layers=file_layers)
        shared = {"head_1", "head_2", "head_4"}
        matched = sorted(
            ("head" if n in shared else n)
            for n in file_layers if n in params or n in shared)
        unmatched_file = sorted(n for n in file_layers
                                if n not in params and n not in shared)
        unmatched_model = sorted(k for k in params if k not in matched)
        print(f"== weights: {path}")
        print(f"   matched {len(set(matched))}/{len(params)} model params "
              f"from {len(file_layers)} file layers")
        if unmatched_file:
            print(f"   file layers ignored: {unmatched_file}")
        if unmatched_model:
            print(f"   model params kept at init: {unmatched_model}")
        if len(set(matched)) < len(params):
            print("   WARNING: not all model params came from the file — "
                  "AP will not be parity-grade")
    else:
        from smallhardface_tpu.io import checkpoint
        checkpoint.load_params(path, params)   # raises on mismatch
        print(f"== weights: {path} (native checkpoint, all params loaded)")


def run_eval(model, data_dir, exp_dir, extra, cli):
    cmd = [sys.executable, cli, "--train", "false", "--test", "true",
           "--conf", "smallhardface_tpu/configs/smallhardface.toml",
           "--amend", "DATA_DIR", data_dir, "TEST.MODEL", model,
           "EXP_DIR", exp_dir, "NAME", "appar"] + extra
    subprocess.run(cmd, cwd=REPO, check=True)
    # honour an amended ROOT_DIR (output lands under <ROOT_DIR>/output)
    root = REPO
    if "ROOT_DIR" in extra:
        root = extra[extra.index("ROOT_DIR") + 1]
    runs = sorted(glob.glob(
        os.path.join(root, "output", exp_dir, "wider_val", "appar_*")))
    if not runs:
        raise SystemExit(
            f"eval finished but no run directory matches "
            f"{root}/output/{exp_dir}/wider_val/appar_* — if extra "
            "--amend pairs override NAME or EXP_DIR the harness cannot "
            "find its output; let ap_parity own those two keys")
    out = runs[-1]
    log = open(os.path.join(out, "stderr.log")).read()
    m = AP_RE.findall(log)
    ap = tuple(float(v) for v in m[-1]) if m else None
    return os.path.join(out, "result.tar.gz"), ap


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wider_root", help="WIDER_FACE root (or `synth` with "
                                      "--dry-run)")
    p.add_argument("weights", help=".caffemodel or .npz (or `synth` with "
                                   "--dry-run)")
    p.add_argument("--dry-run", action="store_true",
                   help="build synthetic data (and weights when `synth`) "
                        "instead of requiring the real artifacts")
    p.add_argument("--n-images", type=int, default=40,
                   help="synthetic image count for --dry-run")
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--score-tol", type=float, default=0.01)
    p.add_argument("--amend", nargs="*", default=[],
                   help="extra KEY VALUE amends for BOTH eval runs")
    p.add_argument("--cli", default="train_test.py",
                   help="CLI entry override (test hook: a wrapper that "
                        "shrinks the backbone)")
    args = p.parse_args(argv)

    data = args.wider_root
    if args.dry_run and (data == "synth" or not os.path.isdir(data)):
        data = tempfile.mkdtemp(prefix="ap_parity_synth_")
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        import synth_wider
        synth_wider.build(data, n_images=args.n_images, im_size=256,
                          faces_per_image=2, seed=0)
        print(f"== built synthetic WIDER at {data}")
    validate_layout(data)

    weights = args.weights
    if args.dry_run and weights == "synth":
        import jax
        from smallhardface_tpu.config import cfg
        from smallhardface_tpu.io import caffemodel
        from smallhardface_tpu.models import detector as dm
        spec = dm.build_spec(cfg)
        params = dm.init_params(jax.random.PRNGKey(3), spec)
        weights = os.path.join(data, "synth.caffemodel")
        caffemodel.export_params(weights, params)
        print(f"== built random-init caffemodel fixture at {weights}")
    if not os.path.exists(weights):
        raise SystemExit(f"weights not found: {weights}")
    weights_report(weights)

    tar_dev, ap_dev = run_eval(weights, data, "ap_parity_dev",
                               list(args.amend), args.cli)
    tar_host, ap_host = run_eval(
        weights, data, "ap_parity_host",
        list(args.amend) + ["TPU.HOST_PREPROC", "True"], args.cli)

    print(f"== device path AP (easy/medium/hard): {ap_dev}")
    print(f"== host   path AP (easy/medium/hard): {ap_host}")
    print("== reference published (README.md:5-7): (0.957, 0.949, 0.897)")
    subprocess.run(
        [sys.executable, "-m", "smallhardface_tpu.tools.compare_dets",
         tar_dev, tar_host, "--iou", str(args.iou),
         "--score-tol", str(args.score_tol)],
        cwd=REPO, check=True)
    if ap_dev is None or ap_host is None:
        raise SystemExit("could not parse AP from a run log")
    delta = max(abs(a - b) for a, b in zip(ap_dev, ap_host))
    verdict = "OK" if delta <= 0.001 else "DIVERGENT"
    print(f"== PARITY {verdict}: max AP delta device-vs-host "
          f"{delta:.4f}")
    return 0 if verdict == "OK" else 1


if __name__ == "__main__":
    sys.exit(main())
