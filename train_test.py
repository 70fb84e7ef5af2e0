#!/usr/bin/env python3
"""Entrance for training and testing (public workflow parity with
/root/reference/train_test.py:32-137):

  python train_test.py --train {true,false} --test {true,false}
      --conf <toml> --amend KEY VALUE [KEY VALUE ...]

Artifacts land in output/<EXP_DIR>/<imdb>/<NAME>_<time>/: stderr.log,
cfgs.txt, snapshots, detections.pkl, result.tar.gz.
"""

import argparse
import datetime
import logging
import os
import os.path as osp
import sys

import numpy as np

from smallhardface_tpu.config import (
    cfg, cfg_from_file, cfg_from_list, get_output_dir, cfg_print, cfg_dump,
    cfg_table)
from smallhardface_tpu.utils.tensorboard import tb, Tensorboard

logging.basicConfig(
    format=("%(asctime)s,%(msecs)d %(levelname)-8s "
            "[%(filename)s:%(lineno)d] %(message)s"),
    datefmt="%m-%d-%Y:%H:%M:%S",
    level=logging.DEBUG if os.environ.get("DEBUG") == "1" else logging.INFO)
logger = logging.getLogger(__name__)


def parser():
    p = argparse.ArgumentParser(
        "Train and test", description="Give settings")
    p.add_argument("--train", dest="train", help="do training",
                   default="true")
    p.add_argument("--test", dest="test", help="do testing", default="true")
    p.add_argument("--conf", dest="conf_file",
                   help="provide configure file", default="")
    p.add_argument("--amend", dest="set_cfgs", help="provide amend cfgs",
                   default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def _redirect_stderr(output_dir):
    f = open(osp.join(output_dir, "stderr.log"), "w")
    os.dup2(f.fileno(), sys.stderr.fileno())
    return f


def _device_fault(exc):
    """A device-RUNTIME fault (worker crash/preemption), as opposed to a
    bug in this code: only these are worth an automatic relaunch."""
    if type(exc).__name__ not in ("JaxRuntimeError", "XlaRuntimeError"):
        return False
    msg = str(exc)
    return any(s in msg for s in
               ("UNAVAILABLE", "DATA_LOSS", "ABORTED", "crashed",
                "restarted", "preempted"))


def _auto_resume_budget(exc):
    """Relaunches left for this fault, or None when not applicable.

    TRAIN.AUTO_RESUME (fault tolerance, a TPU extension — the reference
    solver just died): preemptible TPU workers really do crash mid-run
    ("UNAVAILABLE: TPU worker process crashed or restarted", observed at
    iter 41540 of a 60k schedule on this machine). The dead PJRT client
    cannot be re-initialised in-process, so recovery is process-level:
    os.execve gives the relaunch a fresh backend while inheriting stdio
    (nohup logs keep appending). The retry budget rides an env var so it
    survives the exec. Single-controller only — under multi-host every
    process would have to re-rendezvous, which is the launcher's job."""
    left_env = os.environ.get("SHF_AUTO_RESUME_LEFT")
    left = int(left_env) if left_env is not None else \
        int(cfg.TRAIN.AUTO_RESUME)
    if left <= 0 or not _device_fault(exc):
        return None
    # Single-controller only: under multi-host, one process re-exec'ing
    # solo would deadlock its peers' collectives — ask the runtime for
    # the real process count (launch mechanisms don't all set the env
    # var), falling back to the env var when the dead backend can't say.
    try:
        import jax
        n_procs = jax.process_count()
    except Exception:
        n_procs = int(os.environ.get("JAX_NUM_PROCESSES", "1") or 1)
    if n_procs > 1:
        return None
    return left


def _exec_relaunch(argv, left):
    env = dict(os.environ)
    env["SHF_AUTO_RESUME_LEFT"] = str(left)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, argv, env)


def _maybe_auto_resume_train(exc, output_dir):
    """On a device-runtime fault during TRAINING, re-exec this CLI with
    TRAIN.RESUME pointing at the newest snapshot of the crashed run.
    Re-raises `exc` when not applicable."""
    left = _auto_resume_budget(exc)
    if left is None:
        raise exc
    import glob
    import re
    snaps = []
    for p in glob.glob(osp.join(output_dir, "*_iter_*.npz")):
        m = re.search(r"_iter_(\d+)\.npz$", p)
        if m:
            snaps.append((int(m.group(1)), p))
    latest = max(snaps)[1] if snaps else ""
    logger.exception(
        "Device-runtime fault during training (%d auto-resume "
        "relaunch(es) left); relaunching from %s", left - 1,
        latest or "scratch")
    argv = [sys.executable] + list(sys.argv)
    if "--amend" not in argv:
        argv.append("--amend")
    if latest:
        # cfg_from_list applies pairs in order, so this appended pair
        # overrides any TRAIN.RESUME from the original command line or a
        # previous relaunch
        argv += ["TRAIN.RESUME", latest]
    _exec_relaunch(argv, left - 1)


def _argv_train_false(argv):
    """Rewrite `argv` (argv[0] = interpreter) so the relaunch runs with
    training off, handling both `--train true` and `--train=true`
    spellings (the =-form would otherwise win in argparse over an
    inserted pair and re-run the whole training from scratch).
    Everything from --amend on is argparse REMAINDER — never touched."""
    argv = list(argv)
    limit = argv.index("--amend") if "--amend" in argv else len(argv)
    eq_forms = [i for i in range(limit) if argv[i].startswith("--train=")]
    for i in eq_forms:
        argv[i] = "--train=false"
    if "--train" in argv[:limit]:
        argv[argv.index("--train") + 1] = "false"
    elif not eq_forms:
        # insert BEFORE any --amend: argparse's REMAINDER would swallow it
        argv[2:2] = ["--train", "false"]
    return argv


def _maybe_auto_resume_test(exc):
    """On a device-runtime fault during EVALUATION, re-exec with
    --train false (training work, if any, is already on disk as
    final.npz — cfg.TEST.MODEL points there) and redo only the eval.
    Re-raises `exc` when not applicable."""
    left = _auto_resume_budget(exc)
    if left is None:
        raise exc
    argv = _argv_train_false([sys.executable] + list(sys.argv))
    if "--amend" not in argv:
        argv.append("--amend")
    if cfg.TEST.MODEL:
        argv += ["TEST.MODEL", str(cfg.TEST.MODEL)]
    logger.exception(
        "Device-runtime fault during evaluation (%d auto-resume "
        "relaunch(es) left); relaunching eval with model %s",
        left - 1, cfg.TEST.MODEL or "<config default>")
    _exec_relaunch(argv, left - 1)


def main():
    # The axon TPU plugin in this image overrides JAX_PLATFORMS from the
    # environment at import; the config update is authoritative (same
    # workaround as tests/conftest.py). Honouring the env var lets CI /
    # scripted checks force the CPU backend through the real CLI.
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # Persistent compilation cache (the env-var form is ignored by this jax
    # version): repeat runs skip the multi-minute XLA compile of the train
    # step and pyramid programs.
    jax.config.update("jax_compilation_cache_dir", osp.join(
        osp.dirname(osp.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    args = parser()
    if args.conf_file:
        cfg_from_file(args.conf_file)
    # train/test runs normally don't want stale caches; --amend can override
    cfg.TEST.NO_CACHE = True
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    cfg.LOG.CMD = " ".join(sys.argv)
    cfg.LOG.TIME = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    np.random.seed(int(cfg.RNG_SEED))

    if cfg.TENSORBOARD.ENABLE:
        tb.client = Tensorboard(hostname=cfg.TENSORBOARD.HOSTNAME,
                                port=cfg.TENSORBOARD.PORT)
        tb.sess = tb.client.create_experiment(
            cfg.NAME + "_" + cfg.LOG.TIME)

    if args.train in ("true", "True"):
        from smallhardface_tpu.datasets.factory import get_imdb
        from smallhardface_tpu.train.train_loop import (
            train_net, get_training_roidb)

        imdb = get_imdb(cfg.TRAIN.DB)
        roidb = get_training_roidb(imdb)

        output_dir = get_output_dir(imdb.name, cfg.NAME + "_" + cfg.LOG.TIME)
        _redirect_stderr(output_dir)
        cfg_print(cfg)
        with open(osp.join(output_dir, "cfgs.txt"), "w") as f:
            cfg_dump({i: cfg[i] for i in cfg if i != "TEST"}, f)
        tb.sess.add_text(
            "train_cfg", cfg_table({i: cfg[i] for i in cfg if i != "TEST"}))

        try:
            train_net(roidb, output_dir=output_dir,
                      pretrained_model=cfg.TRAIN.PRETRAINED,
                      max_iter=cfg.TRAIN.ITERS)
        except Exception as e:       # noqa: BLE001 — filtered inside
            _maybe_auto_resume_train(e, output_dir)  # execs or re-raises
        # wire the trained weights into the following test
        cfg.TEST.MODEL = osp.join(output_dir, "final.npz")

    if args.test in ("true", "True"):
        from smallhardface_tpu.datasets.factory import get_imdb
        from smallhardface_tpu.test_runner import test_net

        if not cfg.TEST.DEMO.ENABLE:
            imdb = get_imdb(cfg.TEST.DB)
            output_dir = get_output_dir(
                imdb.name, cfg.NAME + "_" + cfg.LOG.TIME)
        else:
            imdb = None
            output_dir = get_output_dir(
                "demo", cfg.NAME + "_" + cfg.LOG.TIME)
        _redirect_stderr(output_dir)
        with open(osp.join(output_dir, "cfgs.txt"), "w") as f:
            cfg_dump({i: cfg[i] for i in cfg if i != "TRAIN"}, f)
        tb.sess.add_text(
            "test_cfg", cfg_table({i: cfg[i] for i in cfg if i != "TRAIN"}))
        try:
            test_net(imdb, output_dir, no_cache=cfg.TEST.NO_CACHE)
        except Exception as e:       # noqa: BLE001 — filtered inside
            _maybe_auto_resume_test(e)          # execs away or re-raises


if __name__ == "__main__":
    main()
