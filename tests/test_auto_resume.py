"""TRAIN.AUTO_RESUME: automatic relaunch-from-snapshot on device faults.

Motivated by a real failure on this machine: a 60k-iteration schedule run
died at iter 41540 with "UNAVAILABLE: TPU worker process crashed or
restarted" (a preemptible-worker failure mode the reference never had to
survive — its solver just died, caffe/src/caffe/solver.cpp Step loop has
no retry). The dead PJRT client cannot be revived in-process, so recovery
is process-level: train_test.py catches the device-runtime fault and
os.execve's itself with TRAIN.RESUME pointing at the newest snapshot.

The end-to-end test injects a synthetic fault (SHF_FAULT_ITER) into a
from-scratch CLI run and asserts the relaunched run completes AND that
its final weights are bit-identical to an uninterrupted control run —
i.e. fault + auto-resume is invisible in the trained artifact (the same
bit-reproducibility contract tests/test_train_loop.py proves for manual
resume).
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Re-exec lands back in this wrapper (argv[0]), so the skeletal-backbone
# shrink survives the relaunch; mirrors tests/test_multihost.TRAIN_CHILD.
WRAPPER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from smallhardface_tpu.models import detector as dm
from smallhardface_tpu.train import train_loop
dm.VGG_STAGES = (
    ("conv1", 8, 1), ("conv2", 8, 1), ("conv3", 16, 1),
    ("conv4", 16, 1), ("conv5", 16, 1))
train_loop.BUCKET = 32
import train_test
train_test.main()
"""


def _run_cli(tmp_path, tag, fault_iter, auto_resume, iters=10, snapshot=4,
             do_test=False, fault_test=False):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import synth_wider

    data_dir = str(tmp_path / f"data_{tag}")
    synth_wider.build(data_dir, n_images=4, im_size=64,
                      faces_per_image=1, seed=0)
    out_root = str(tmp_path / f"out_{tag}")
    wrapper = str(tmp_path / "wrapper.py")
    if not os.path.exists(wrapper):
        with open(wrapper, "w") as f:
            f.write(WRAPPER.format(repo=REPO))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("SHF_AUTO_RESUME_LEFT", None)
    if fault_iter:
        env["SHF_FAULT_ITER"] = str(fault_iter)
    else:
        env.pop("SHF_FAULT_ITER", None)
    if fault_test:
        env["SHF_FAULT_TEST"] = "1"
    else:
        env.pop("SHF_FAULT_TEST", None)
    cmd = [
        sys.executable, wrapper,
        "--train", "true", "--test", "true" if do_test else "false",
        "--conf", "smallhardface_tpu/configs/smallhardface.toml",
        "--amend",
        "ROOT_DIR", out_root,
        "DATA_DIR", data_dir,
        "NAME", "ar",
        "EXP_DIR", "synth",
        "TRAIN.ITERS", str(iters),
        "TRAIN.SNAPSHOT", str(snapshot),
        "TRAIN.ITERSIZE", "1",
        "TRAIN.SCALES.SHORT_SIDE", "[64]",
        "TRAIN.SCALES.MAX_SIZE", "128",
        "TRAIN.AUGMENT.ENABLE", "False",
        "TRAIN.DISABLE_EASY_IMAGE.ENABLE", "False",
        "TRAIN.PRETRAINED", "",
        "TRAIN.AUTO_RESUME", str(auto_resume),
        "TPU.NUM_DEVICES", "2",
        "TPU.MAX_GT_BUCKETS", "[8]",
    ]
    if do_test:
        cmd += ["TEST.SCALES", "[64]", "TEST.MAX_SIZE", "128",
                "TPU.TEST_BUCKET", "32"]
    proc = subprocess.run(cmd, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)
    run_dirs = sorted(glob.glob(os.path.join(
        out_root, "output", "synth", "*", "ar_*")))
    logs = ""
    for d in run_dirs:
        lg = os.path.join(d, "stderr.log")
        if os.path.exists(lg):
            with open(lg) as f:
                logs += f"--- {d}\n" + f.read()
    return proc, run_dirs, logs


def _final_params(run_dirs):
    from smallhardface_tpu.io import checkpoint
    finals = [os.path.join(d, "final.npz") for d in run_dirs
              if os.path.exists(os.path.join(d, "final.npz"))]
    assert len(finals) == 1, f"want exactly one final.npz, got {finals}"
    params, _, it, _ = checkpoint.load(finals[0])
    return params, it


def test_fault_then_auto_resume_completes_bit_identical(tmp_path):
    # control: no fault
    proc, dirs, logs = _run_cli(tmp_path, "ctl", fault_iter=0,
                                auto_resume=0)
    assert proc.returncode == 0, (
        f"control rc={proc.returncode}\n{proc.stderr[-2000:]}\n"
        f"{logs[-3000:]}")
    ctl_params, ctl_it = _final_params(dirs)
    assert ctl_it == 10

    # faulted: crash at iter 6 (snapshot exists at 4), one relaunch allowed
    proc, dirs, logs = _run_cli(tmp_path, "flt", fault_iter=6,
                                auto_resume=1)
    assert proc.returncode == 0, (
        f"faulted rc={proc.returncode}\n{proc.stderr[-2000:]}\n"
        f"{logs[-3000:]}")
    assert "injected TPU worker fault" in logs
    assert "relaunching from" in logs
    assert len(dirs) == 2, f"want crashed + relaunched run dirs: {dirs}"
    flt_params, flt_it = _final_params(dirs)
    assert flt_it == 10

    import jax
    ctl = {jax.tree_util.keystr(p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(ctl_params)}
    flt = {jax.tree_util.keystr(p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(flt_params)}
    assert ctl.keys() == flt.keys()
    for k in sorted(ctl):
        np.testing.assert_array_equal(
            ctl[k], flt[k],
            err_msg=f"leaf {k} differs: fault+auto-resume is not "
                    "bit-invisible")


def test_fault_without_budget_fails_loudly(tmp_path):
    """AUTO_RESUME=0 (the default) must NOT swallow the fault."""
    proc, dirs, logs = _run_cli(tmp_path, "nob", fault_iter=2,
                                auto_resume=0, iters=4, snapshot=2)
    assert proc.returncode != 0
    assert "injected TPU worker fault" in (logs + proc.stderr)
    assert not glob.glob(os.path.join(
        str(tmp_path / "out_nob"), "output", "synth", "*", "ar_*",
        "final.npz"))


def test_fault_in_eval_relaunches_without_retraining(tmp_path):
    """A device fault during the post-training EVAL must not cost the
    training work: the relaunch runs with --train false and the trained
    weights wired via TEST.MODEL, and the WIDER eval completes."""
    proc, dirs, logs = _run_cli(tmp_path, "ev", fault_iter=0,
                                auto_resume=1, iters=4, snapshot=4,
                                do_test=True, fault_test=True)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\n{proc.stderr[-2000:]}\n{logs[-3000:]}")
    assert "injected TPU worker fault (SHF_FAULT_TEST)" in logs
    assert "relaunching eval" in logs
    assert "Easy:" in logs, "WIDER AP line missing — eval never completed"
    finals = [d for d in dirs
              if os.path.exists(os.path.join(d, "final.npz"))]
    assert len(finals) == 1, (
        f"training must run exactly once, final.npz in {finals}")


def test_argv_train_false_rewrites_both_spellings():
    """The eval-phase relaunch must turn training off whichever way the
    original command line spelled it — `--train=true` used to survive and
    win in argparse, re-running the whole training (ADVICE r4)."""
    import train_test as tt
    # space-separated form
    argv = ["py", "train_test.py", "--train", "true", "--test", "true",
            "--amend", "A", "1"]
    assert tt._argv_train_false(argv) == [
        "py", "train_test.py", "--train", "false", "--test", "true",
        "--amend", "A", "1"]
    # =-form
    argv = ["py", "train_test.py", "--train=true", "--test", "true",
            "--amend", "A", "1"]
    assert tt._argv_train_false(argv) == [
        "py", "train_test.py", "--train=false", "--test", "true",
        "--amend", "A", "1"]
    # absent: inserted before --amend
    argv = ["py", "train_test.py", "--test", "true", "--amend", "A", "1"]
    assert tt._argv_train_false(argv) == [
        "py", "train_test.py", "--train", "false", "--test", "true",
        "--amend", "A", "1"]
    # amend values are REMAINDER — never rewritten, even if they look
    # like flags
    argv = ["py", "train_test.py", "--train", "true", "--amend",
            "LOG.CMD", "--train=true"]
    out = tt._argv_train_false(argv)
    assert out[out.index("--amend"):] == ["--amend", "LOG.CMD",
                                          "--train=true"]
    assert out[2:4] == ["--train", "false"]


def test_device_fault_classifier():
    """Only device-RUNTIME faults are retryable; bugs re-raise."""
    import jax
    import train_test as tt
    assert tt._device_fault(jax.errors.JaxRuntimeError(
        "UNAVAILABLE: TPU worker process crashed or restarted."))
    assert tt._device_fault(jax.errors.JaxRuntimeError(
        "DATA_LOSS: checkpoint stream corrupt"))
    assert not tt._device_fault(jax.errors.JaxRuntimeError(
        "INVALID_ARGUMENT: shapes do not match"))
    assert not tt._device_fault(ValueError("UNAVAILABLE"))
    assert not tt._device_fault(RuntimeError("crashed"))
