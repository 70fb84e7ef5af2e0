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

        train_net(roidb, output_dir=output_dir,
                  pretrained_model=cfg.TRAIN.PRETRAINED,
                  max_iter=cfg.TRAIN.ITERS)
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
        test_net(imdb, output_dir, no_cache=cfg.TEST.NO_CACHE)


if __name__ == "__main__":
    main()
