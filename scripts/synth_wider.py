"""Build a tiny synthetic WIDER-FACE-format dataset on disk.

Produces everything the full pipeline touches, in the exact on-disk layout
the reference expects (/root/reference/lib/datasets/wider.py:36-63 for the
bbx_gt annotation format, lib/wider_eval_tools for the ground-truth .mat
protocol):

  <root>/WIDER_train/images/<event>/<name>.jpg
  <root>/WIDER_val/images/<event>/<name>.jpg
  <root>/wider_face_split/wider_face_train_bbx_gt.txt
  <root>/wider_face_split/wider_face_val_bbx_gt.txt
  <root>/ground_truth/wider_face_val.mat (+ easy/medium/hard setting mats)

"Faces" are a fixed high-contrast glyph (bright panel, dark border, two
dark eye dots) stamped on a noisy gray background, sized to land on the
detector's 16/32/64-px square anchors. Used by the end-to-end overfit
check (scripts/overfit_check.py) and the e2e tests.
"""

from __future__ import annotations

import os

import numpy as np

EVENT = "0--synth"


def _stamp_face(img, x1, y1, size, rng):
    """Draw a face glyph whose box is (x1, y1, x1+size, y1+size)."""
    x2, y2 = x1 + size, y1 + size
    img[y1:y2, x1:x2] = 230                      # bright panel
    b = max(2, size // 12)                       # dark border
    img[y1:y1 + b, x1:x2] = 25
    img[y2 - b:y2, x1:x2] = 25
    img[y1:y2, x1:x1 + b] = 25
    img[y1:y2, x2 - b:x2] = 25
    ey = y1 + size // 3                          # eye dots
    r = max(2, size // 10)
    for ex in (x1 + size // 3, x1 + 2 * size // 3):
        img[ey - r:ey + r, ex - r:ex + r] = 40


def make_images(n_images=4, im_size=192, faces_per_image=2, seed=0,
                min_face=32, max_face=56):
    """Returns list of (uint8 HWC BGR image, (F,4) [x1,y1,x2,y2] boxes)."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_images):
        img = rng.randint(95, 125, (im_size, im_size, 3), np.uint8)
        # place faces on a jittered grid so they never overlap
        boxes = []
        cols = faces_per_image
        cell = im_size // cols
        for c in range(cols):
            size = int(rng.randint(min_face, max_face + 1))
            x1 = c * cell + int(rng.randint(0, max(cell - size - 2, 1)))
            y1 = int(rng.randint(4, im_size - size - 4))
            gray = img[..., 0].copy()
            _stamp_face(gray, x1, y1, size, rng)
            img = np.stack([gray] * 3, axis=-1)
            boxes.append([x1, y1, x1 + size, y1 + size])
        out.append((img, np.asarray(boxes, np.float64)))
    return out


def _cell(items):
    arr = np.empty((len(items), 1), dtype=object)
    for i, it in enumerate(items):
        arr[i, 0] = it
    return arr


def build(root, n_images=4, im_size=192, faces_per_image=2, seed=0):
    """Write the dataset under `root`; returns the list of (name, boxes)."""
    import cv2
    from scipy import io as sio

    samples = make_images(n_images, im_size, faces_per_image, seed)
    names = [f"img_{i}" for i in range(len(samples))]

    for split in ("train", "val"):
        img_dir = os.path.join(root, f"WIDER_{split}", "images", EVENT)
        os.makedirs(img_dir, exist_ok=True)
        anno_dir = os.path.join(root, "wider_face_split")
        os.makedirs(anno_dir, exist_ok=True)
        lines = []
        for name, (img, boxes) in zip(names, samples):
            cv2.imwrite(os.path.join(img_dir, name + ".jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 100])
            lines.append(f"{EVENT}/{name}.jpg\n")
            lines.append(f"{len(boxes)}\n")
            for x1, y1, x2, y2 in boxes:
                lines.append(f"{int(x1)} {int(y1)} {int(x2 - x1)} "
                             f"{int(y2 - y1)} 0 0 0 0 0 0\n")
        with open(os.path.join(anno_dir,
                               f"wider_face_{split}_bbx_gt.txt"), "w") as f:
            f.writelines(lines)

    # ground-truth mats: one event, every face kept in every difficulty
    file_list = _cell([np.array([n]) for n in names])
    bbx_list = _cell([
        np.column_stack([b[:, 0], b[:, 1],
                         b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]])
        for _, b in samples])
    gt_list = _cell([np.arange(1, len(b) + 1)[:, None] for _, b in samples])
    gt = {
        "event_list": _cell([np.array([EVENT])]),
        "file_list": _cell([file_list]),
        "face_bbx_list": _cell([bbx_list]),
        "gt_list": _cell([gt_list]),
    }
    gtdir = os.path.join(root, "ground_truth")
    os.makedirs(gtdir, exist_ok=True)
    sio.savemat(os.path.join(gtdir, "wider_face_val.mat"), gt)
    for s in ("easy_val", "medium_val", "hard_val"):
        sio.savemat(os.path.join(gtdir, f"wider_{s}.mat"), gt)
    return list(zip(names, [b for _, b in samples]))
