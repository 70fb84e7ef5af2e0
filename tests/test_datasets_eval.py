import os

import numpy as np
import pytest
from scipy import io as sio

from smallhardface_tpu.config import cfg

EVENT_NUM = 61


def _cell(items):
    arr = np.empty((len(items), 1), dtype=object)
    for i, it in enumerate(items):
        arr[i, 0] = it
    return arr


def _make_wider_fixture(tmp_path, n_faces=2):
    """Synthetic 61-event WIDER ground truth + matching predictions."""
    events, file_lists, bbx_lists, gt_lists = [], [], [], []
    rng = np.random.RandomState(0)
    all_gt = {}
    for e in range(EVENT_NUM):
        ev = f"{e}--event{e}"
        events.append(np.array([ev]))
        names = [f"img_{e}_0"]
        file_lists.append(_cell([np.array([n]) for n in names]))
        # disjoint faces: with MIMIC_EVAL_BUG the rounded-IoU argmax
        # mismatches overlapping gts, so keep them far apart here
        boxes = np.zeros((n_faces, 4))
        boxes[:, 0] = 100 * np.arange(n_faces) + rng.uniform(0, 20, n_faces)
        boxes[:, 1] = rng.uniform(0, 50, n_faces)
        boxes[:, 2] = rng.uniform(20, 40, n_faces)   # w
        boxes[:, 3] = rng.uniform(20, 40, n_faces)   # h
        bbx_lists.append(_cell([boxes]))
        gt_lists.append(_cell([np.arange(1, n_faces + 1)[:, None]]))
        all_gt[(ev, names[0])] = boxes
    gt = {
        "event_list": _cell(events),
        "file_list": _cell(file_lists),
        "face_bbx_list": _cell(bbx_lists),
        "gt_list": _cell(gt_lists),
    }
    gtdir = tmp_path / "ground_truth"
    gtdir.mkdir()
    sio.savemat(gtdir / "wider_face_val.mat", gt)
    for s in ["easy_val", "medium_val", "hard_val"]:
        sio.savemat(gtdir / f"wider_{s}.mat", gt)

    # predictions identical to gt (x y w h score)
    preddir = tmp_path / "detections"
    for (ev, name), boxes in all_gt.items():
        d = preddir / ev
        d.mkdir(parents=True, exist_ok=True)
        with open(d / f"{name}.txt", "w") as f:
            f.write(f"{ev}/{name}.jpg\n{len(boxes)}\n")
            for i, b in enumerate(boxes):
                score = 1.0 - 0.01 * i
                f.write(f"{b[0]:.1f} {b[1]:.1f} {b[2]:.1f} {b[3]:.1f} "
                        f"{score:.4f}\n")
    return str(preddir), str(gtdir)


@pytest.mark.parametrize("bug", [True, False])
def test_wider_eval_perfect_predictions(tmp_path, bug):
    from smallhardface_tpu.evals.wider_eval import wider_eval
    pred_dir, gt_dir = _make_wider_fixture(tmp_path)
    ap, pr = wider_eval(pred_dir, gt_dir, parallel=False,
                        mimic_eval_bug=bug, iou_thresh=0.5)
    assert len(ap) == 3
    for a in ap:
        assert a > 0.99, f"perfect predictions must give AP≈1, got {a}"


def test_wider_eval_misses_lower_ap(tmp_path):
    from smallhardface_tpu.evals.wider_eval import wider_eval
    pred_dir, gt_dir = _make_wider_fixture(tmp_path)
    # overwrite half the prediction files with an off-position box
    for e in range(0, EVENT_NUM, 2):
        ev = f"{e}--event{e}"
        path = os.path.join(pred_dir, ev, f"img_{e}_0.txt")
        with open(path, "w") as f:
            f.write("x\n1\n500.0 500.0 10.0 10.0 1.0\n")
    ap, _ = wider_eval(pred_dir, gt_dir, parallel=False,
                       mimic_eval_bug=True)
    assert all(0.2 < a < 0.8 for a in ap)


def test_mimic_eval_bug_changes_matching():
    """With the official toolkit's rounding bug, two gts that both overlap a
    pred ≥0.5 tie at rounded IoU 1 and the argmax picks the first gt — so a
    second pred matching the second gt re-matches the first and recall is
    lost (wider_eval.py:88-90 in the reference)."""
    from smallhardface_tpu.evals.wider_eval import image_evaluation
    # two heavily-overlapping gts (x y w h)
    gt = np.array([[10.0, 10, 30, 30], [12.0, 12, 30, 30]])
    preds = np.array([
        [10.0, 10, 30, 30, 0.9],   # exactly gt0
        [12.0, 12, 30, 30, 0.8],   # exactly gt1
    ])
    ignore = np.ones((2, 1))
    pr_bug, _ = image_evaluation(preds.copy(), gt.copy(), ignore, 0.5, True)
    pr_ok, _ = image_evaluation(preds.copy(), gt.copy(), ignore, 0.5, False)
    assert pr_ok[-1, 0] == 2       # both gts recalled without the bug
    assert pr_bug[-1, 0] == 1      # bug: second pred re-matches gt0


def test_image_pr_info_matches_loop_reference(rng):
    """The vectorized threshold sweep must equal the reference's explicit
    per-threshold loop (wider_eval.py:103-116)."""
    from smallhardface_tpu.evals.wider_eval import image_pr_info, THRESH_NUM

    def loop_version(pred_info, proposal_list, pred_recall):
        out = np.zeros((THRESH_NUM, 2))
        scores = pred_info[:, -1]
        for t in range(THRESH_NUM):
            thresh = 1 - (t + 1.0) / THRESH_NUM
            above = np.where(scores >= thresh)[0]
            if above.size == 0:
                continue
            r_index = above[-1]
            p_index = np.where(proposal_list[:r_index + 1] == 1)[0]
            out[t] = [len(p_index), pred_recall[r_index, 0]]
        return out

    for n in (1, 7, 40):
        scores = np.sort(rng.uniform(0, 1, n))[::-1]
        pred_info = np.zeros((n, 5))
        pred_info[:, -1] = scores
        proposal_list = rng.choice([-1.0, 1.0], (n, 1))
        pred_recall = np.cumsum(rng.randint(0, 2, (n, 1)), axis=0).astype(
            np.float64)
        got = image_pr_info(pred_info, proposal_list, pred_recall)
        want = loop_version(pred_info, proposal_list, pred_recall)
        np.testing.assert_array_equal(got, want)


def test_round_half_away():
    from smallhardface_tpu.evals.wider_eval import _round_half_away
    assert _round_half_away(0.5) == 1
    assert _round_half_away(0.49) == 0
    assert _round_half_away(-0.5) == -1
    assert _round_half_away(1.5) == 2


def test_voc_ap_known_values():
    from smallhardface_tpu.evals.wider_eval import voc_ap
    # perfect: precision 1 at all recalls
    assert voc_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == 1.0
    # half recall at precision 1
    np.testing.assert_allclose(
        voc_ap(np.array([0.5]), np.array([1.0])), 0.5)


def _make_wider_dataset_fixture(tmp_path):
    """Minimal wider_train layout: annotation txt + images."""
    import cv2
    data = tmp_path / "WIDER"
    (data / "wider_face_split").mkdir(parents=True)
    imgdir = data / "WIDER_train" / "images" / "0--ev"
    imgdir.mkdir(parents=True)
    for i in range(2):
        im = np.full((60, 80, 3), 128, np.uint8)
        cv2.imwrite(str(imgdir / f"im{i}.jpg"), im)
    anno = data / "wider_face_split" / "wider_face_train_bbx_gt.txt"
    with open(anno, "w") as f:
        # image 0: two boxes, one degenerate (w=0)
        f.write("0--ev/im0.jpg\n2\n10 10 20 20 0 0 0 0 0 0\n"
                "5 5 0 10 0 0 0 0 0 0\n")
        f.write("0--ev/im1.jpg\n1\n30 20 25 30 0 0 0 0 0 0\n")
    return str(data)


def test_wider_dataset_roidb(tmp_path):
    from smallhardface_tpu.datasets.factory import get_imdb
    old = cfg.DATA_DIR
    cfg.DATA_DIR = _make_wider_dataset_fixture(tmp_path)
    try:
        imdb = get_imdb("wider_train")
        assert len(imdb) == 2
        roidb = imdb.roidb
        assert roidb[0]["boxes"].shape == (2, 4)
        np.testing.assert_array_equal(roidb[0]["boxes"][0], [10, 10, 30, 30])
        # degenerate box left as a zero row (reference quirk wider.py:117)
        np.testing.assert_array_equal(roidb[0]["boxes"][1], [0, 0, 0, 0])
        assert roidb[1]["image_size"] == (80, 60)

        # flipping
        n = imdb.num_images
        imdb.append_flipped_images()
        assert len(imdb.roidb) == 2 * n
        fb = imdb.roidb[n]["boxes"]
        np.testing.assert_array_equal(fb[0], [80 - 30 - 1, 10,
                                              80 - 10 - 1, 30])
        imdb.prepare_roidb()
        assert "max_overlaps" in imdb.roidb[0]
    finally:
        cfg.DATA_DIR = old


def test_wider_evaluate_detections_golden(tmp_path):
    """Full dataset-eval path: wider.evaluate_detections writes per-image
    txts, runs the WIDER protocol against fixture .mat gt, tars the
    results, and reports AP ≈ 1 for predictions equal to gt."""
    import cv2
    import tarfile
    from smallhardface_tpu.datasets.factory import get_imdb

    # dataset files (val split) + matching .mat ground truth
    data = tmp_path / "DATA"
    (data / "wider_face_split").mkdir(parents=True)
    rng = np.random.RandomState(0)
    anno_lines = []
    events, file_lists, bbx_lists, gt_lists = [], [], [], []
    all_gt = {}
    for e in range(EVENT_NUM):
        ev = f"{e}--event{e}"
        imgdir = data / "WIDER_val" / "images" / ev
        imgdir.mkdir(parents=True)
        name = f"img_{e}_0"
        im = np.full((220, 320, 3), 127, np.uint8)
        cv2.imwrite(str(imgdir / f"{name}.jpg"), im)
        boxes = np.zeros((2, 4))
        boxes[:, 0] = [20, 170]
        boxes[:, 1] = rng.uniform(10, 60, 2)
        boxes[:, 2] = rng.uniform(30, 60, 2)    # w
        boxes[:, 3] = rng.uniform(30, 60, 2)    # h
        all_gt[(ev, name)] = boxes
        anno_lines.append(
            f"{ev}/{name}.jpg\n2\n"
            f"{boxes[0,0]:.0f} {boxes[0,1]:.0f} {boxes[0,2]:.0f} "
            f"{boxes[0,3]:.0f} 0 0 0 0 0 0\n"
            f"{boxes[1,0]:.0f} {boxes[1,1]:.0f} {boxes[1,2]:.0f} "
            f"{boxes[1,3]:.0f} 0 0 0 0 0 0\n")
        events.append(np.array([ev]))
        file_lists.append(_cell([np.array([name])]))
        bbx_lists.append(_cell([np.round(boxes)]))
        gt_lists.append(_cell([np.arange(1, 3)[:, None]]))
    with open(data / "wider_face_split" / "wider_face_val_bbx_gt.txt",
              "w") as f:
        f.writelines(anno_lines)
    gt_mat = {
        "event_list": _cell(events),
        "file_list": _cell(file_lists),
        "face_bbx_list": _cell(bbx_lists),
        "gt_list": _cell(gt_lists),
    }
    (data / "ground_truth").mkdir()
    sio.savemat(data / "ground_truth" / "wider_face_val.mat", gt_mat)
    for s in ["easy_val", "medium_val", "hard_val"]:
        sio.savemat(data / "ground_truth" / f"wider_{s}.mat", gt_mat)

    old = cfg.DATA_DIR
    cfg.DATA_DIR = str(data)
    try:
        imdb = get_imdb("wider_val")
        assert len(imdb) == EVENT_NUM
        # all_boxes[class][image] = (N, 5) [x1 y1 x2 y2 score] — perfect
        # predictions matching the rounded gt
        all_boxes = [[], []]
        for e in range(EVENT_NUM):
            ev = f"{e}--event{e}"
            b = np.round(all_gt[(ev, f"img_{e}_0")])
            dets = np.zeros((2, 5))
            dets[:, 0] = b[:, 0]
            dets[:, 1] = b[:, 1]
            dets[:, 2] = b[:, 0] + b[:, 2]
            dets[:, 3] = b[:, 1] + b[:, 3]
            dets[:, 4] = [0.99, 0.98]
            all_boxes[1].append(dets)
        out = tmp_path / "out"
        out.mkdir()
        result = imdb.evaluate_detections(all_boxes, output_dir=str(out))
        assert "Easy:" in result
        for part in result.replace(",", "").split():
            try:
                v = float(part)
            except ValueError:
                continue
            assert v > 0.99, result
        with tarfile.open(out / "result.tar.gz") as tar:
            assert any(m.name.endswith(".txt") for m in tar.getmembers())
    finally:
        cfg.DATA_DIR = old


def test_factory_unknown_dataset():
    from smallhardface_tpu.datasets.factory import get_imdb
    with pytest.raises(KeyError):
        get_imdb("imagenet_2012")
