import numpy as np


def test_parse_log_with_and_without_smoothed(tmp_path):
    from smallhardface_tpu.tools.parse_log import parse
    log = tmp_path / "stderr.log"
    log.write_text(
        "08-16 INFO [train_loop.py:300] iter 20/100 cls_loss: 0.50000 "
        "reg_loss: 0.10000 smoothed_loss: 0.62000 accuracy: 0.90000 "
        "lr: 4.00e-03 bucket: (128, 256, 8) speed: 2.500 iter/s "
        "ETA: 0:00:32\n"
        "08-16 INFO [train_loop.py:300] iter 40/100 cls_loss: 0.40000 "
        "reg_loss: 0.08000 accuracy: 0.92000 lr: 4.00e-03 "
        "bucket: (128, 256, 8) speed: 2.600 iter/s ETA: 0:00:23\n"
        "unrelated line\n")
    rows = parse(str(log))
    assert len(rows) == 2
    assert rows[0]["iteration"] == 20
    assert rows[0]["smoothed_loss"] == 0.62
    np.testing.assert_allclose(rows[1]["smoothed_loss"], 0.48)  # = total
    assert rows[1]["speed_iter_per_s"] == 2.6
    assert rows[0]["bucket"] == "(128, 256, 8)"
    assert rows[0]["wall_ts"] is None  # short "08-16" stamp: no wall time


def test_parse_log_bucket_summary(tmp_path):
    from smallhardface_tpu.tools.parse_log import bucket_summary, parse
    log = tmp_path / "stderr.log"
    tmpl = ("08-20-2026:04:0{m}:00,000 INFO [train_loop.py:845] "
            "iter {it}/100 cls_loss: 0.4 reg_loss: 0.1 accuracy: 0.9 "
            "lr: 4.00e-03 bucket: {b} speed: 1.0 iter/s ETA: 0:01\n")
    log.write_text(
        tmpl.format(m=1, it=20, b="(512, 512, 64)")
        + tmpl.format(m=2, it=40, b="(896, 896, 64)")
        + tmpl.format(m=3, it=60, b="(512, 512, 64)"))
    s = bucket_summary(parse(str(log)))
    assert s["lines"] == 3
    assert s["buckets"]["(512, 512, 64)"]["lines"] == 2
    assert s["buckets"]["(896, 896, 64)"]["lines"] == 1
    # 20 iters per 60 s window
    for w in s["windowed_iter_per_s"]:
        np.testing.assert_allclose(w["iter_per_s"], 20 / 60.0)
    np.testing.assert_allclose(s["steady_state_iter_per_s"], 20 / 60.0)


def test_compare_dets_symmetric():
    from smallhardface_tpu.tools.compare_dets import match_rate
    a = np.array([[0, 0, 10, 10, 0.9]])
    b_extra = np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8]])
    # spurious extra detection in b must lower the rate
    assert match_rate(a, b_extra, 0.5, 0.01) < 1.0
    assert match_rate(a, a.copy(), 0.5, 0.01) == 1.0
    assert match_rate(np.zeros((0, 5)), np.zeros((0, 5)), 0.5, 0.01) == 1.0
    assert match_rate(a, np.zeros((0, 5)), 0.5, 0.01) == 0.0
