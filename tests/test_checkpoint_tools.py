"""Checkpoint round-trips and CLI-tool smoke coverage."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

from smallhardface_tpu.io import checkpoint


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    params = {"conv": {"w": np.arange(12.0).reshape(3, 4),
                       "b": np.zeros(4)}}
    opt = {"h1": {"conv": {"w": np.ones((3, 4)), "b": np.ones(4)}},
           "h2": {"conv": {"w": 2 * np.ones((3, 4)), "b": np.ones(4)}}}
    path = str(tmp_path / "snap.npz")
    checkpoint.save(path, params, opt, iteration=123,
                    extra={"note": np.float64(1.5)})
    p, o, it, extra = checkpoint.load(path)
    assert it == 123
    np.testing.assert_array_equal(p["conv"]["w"], params["conv"]["w"])
    np.testing.assert_array_equal(o["h2"]["conv"]["w"], 2 * np.ones((3, 4)))
    assert float(extra["note"]) == 1.5


def test_checkpoint_load_params_shape_check(tmp_path):
    params = {"conv": {"w": np.zeros((2, 2))}}
    path = str(tmp_path / "snap.npz")
    checkpoint.save(path, params)
    ref_bad = {"conv": {"w": jnp.zeros((3, 3))}}
    with pytest.raises(AssertionError):
        checkpoint.load_params(path, ref_bad)
    ref_ok = {"conv": {"w": jnp.ones((2, 2))}}
    out = checkpoint.load_params(path, ref_ok)
    np.testing.assert_array_equal(np.asarray(out["conv"]["w"]),
                                  np.zeros((2, 2)))


def test_checkpoint_missing_param_kept(tmp_path):
    params = {"conv": {"w": np.zeros((2, 2))}}
    path = str(tmp_path / "snap.npz")
    checkpoint.save(path, params)
    ref = {"conv": {"w": jnp.ones((2, 2))},
           "extra_layer": {"w": jnp.full((1,), 7.0)}}
    out = checkpoint.load_params(path, ref)
    np.testing.assert_array_equal(np.asarray(out["extra_layer"]["w"]), [7.0])


def test_device_query_tool(capsys):
    from smallhardface_tpu.tools import device_query
    device_query.main()
    out = capsys.readouterr().out
    assert "backend:" in out and "[0]" in out


def test_benchmark_tool(monkeypatch, capsys):
    from smallhardface_tpu.tools import benchmark
    monkeypatch.setattr(sys, "argv", [
        "benchmark", "--height", "32", "--width", "32", "--iters", "2"])
    benchmark.main()
    out = capsys.readouterr().out
    assert "forward" in out and "mean" in out


def test_compare_dets_tool(tmp_path, monkeypatch, capsys):
    import pickle
    from smallhardface_tpu.tools import compare_dets
    dets = [[], [np.array([[1.0, 2, 10, 12, 0.9]]),
                 np.array([[5.0, 5, 20, 25, 0.7]])]]
    a = str(tmp_path / "a.pkl")
    b = str(tmp_path / "b.pkl")
    for p in (a, b):
        with open(p, "wb") as f:
            pickle.dump(dets, f)
    monkeypatch.setattr(sys, "argv", ["compare_dets", a, b])
    compare_dets.main()
    out = capsys.readouterr().out
    assert "mean match-rate 1.0000" in out


def test_compare_dets_wider_txt_and_tar(tmp_path, monkeypatch, capsys):
    """compare_dets also reads the WIDER result artifacts a CLI run leaves
    behind (the driver forces NO_CACHE, so there is no detections.pkl):
    per-image txt trees and result.tar.gz, in the wider.py writer format
    (x, y, w, h, score)."""
    import tarfile
    from smallhardface_tpu.tools import compare_dets
    for side, score in (("a", 0.9), ("b", 0.905)):
        d = tmp_path / side / "detections" / "0--ev"
        d.mkdir(parents=True)
        (d / "img_0.txt").write_text(
            "0--ev/img_0.jpg\n2\n10 20 30 40 %.3f \n50 60 20 20 0.500 \n"
            % score)
    with tarfile.open(tmp_path / "b.tar.gz", "w:gz") as tf:
        tf.add(tmp_path / "b" / "detections", arcname="detections")
    monkeypatch.setattr(sys, "argv", [
        "compare_dets", str(tmp_path / "a"), str(tmp_path / "b.tar.gz")])
    compare_dets.main()
    out = capsys.readouterr().out
    assert "images 1" in out and "mean match-rate 1.0000" in out
    # a tighter score tolerance splits them
    monkeypatch.setattr(sys, "argv", [
        "compare_dets", str(tmp_path / "a"), str(tmp_path / "b.tar.gz"),
        "--score-tol", "0.001"])
    compare_dets.main()
    out = capsys.readouterr().out
    assert "mean match-rate 0.5000" in out
