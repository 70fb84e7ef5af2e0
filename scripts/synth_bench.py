"""Tiny synthetic AFW / FDDB / Pascal Faces / `general` datasets on disk.

The synth_wider.py counterpart for the reference's non-WIDER benchmark
matrix (/root/reference/README.md:5-7 publishes FDDB 98.7, Pascal 99.0,
AFW 99.6): builds the exact on-disk layouts the dataset classes read —

  AFW     <root>/afw_img_list.txt + images at the listed relative paths
          (/root/reference/lib/datasets/afw.py:25-39)
  FDDB    <root>/FDDB-folds/val.txt (paths WITHOUT extension, .jpg
          appended by the loader) + images + FDDB-folds/val_gt.txt +
          a stub evaluation/evaluate binary standing in for the official
          C++ tool: it validates the detection file it is handed and
          emits DiscROC/ContROC files with KNOWN TPR@1000FP values so the
          shell-out command template and the ROC parse
          (lib/datasets/fddb.py:22-105) execute for real
  Pascal  <root>/pascal_img_list.txt + <root>/images/<name>.jpg
          (lib/datasets/pascalface.py:23-27)
  general images under nested subdirectories of <root>
          (lib/datasets/general.py:26-29 walks the tree)

Faces are synth_wider's high-contrast glyphs so a trained detector finds
them; layouts work with random weights too (writers don't need hits).
"""

from __future__ import annotations

import os
import stat

import synth_wider

# The stub evaluate emits these: distinct Disc/Cont values so the two
# ROC parses (fddb.py tpr_at_1000 per file) are checked independently.
# Rows are "tpr fp" with fp descending; TPR@1000FP = first row fp<1000.
STUB_DISC_TPR = 0.9870
STUB_CONT_TPR = 0.7300

_STUB_EVALUATE = '''#!/usr/bin/env python3
"""Stub FDDB `evaluate` binary (the official tool is C++ and not on this
machine): validates the -l/-d inputs like the real tool would trip over
malformed ones, records its argv, and writes DiscROC/ContROC files with
known TPR@1000FP values ({disc} disc / {cont} cont)."""
import os
import sys

args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
for flag in ("-a", "-i", "-l", "-d", "-f", "-r"):
    if flag not in args:
        sys.exit("missing flag " + flag)
with open(args["-l"]) as f:
    names = [ln.strip() for ln in f if ln.strip()]
with open(args["-d"]) as f:
    lines = [ln.rstrip("\\n") for ln in f]
k = 0
for name in names:
    if lines[k] != name:
        sys.exit("detection file image %r != list %r" % (lines[k], name))
    n = int(lines[k + 1])
    k += 2
    for _ in range(n):
        x, y, w, h, s = lines[k].split()
        if float(w) <= 0 or float(h) <= 0 or not 0 <= float(s) <= 1:
            sys.exit("bad rect line: " + lines[k])
        k += 1
if k != len(lines):
    sys.exit("trailing junk in detection file")
here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(here, "..", "evaluate_argv.txt"), "w") as f:
    f.write(" ".join(sys.argv[1:]) + "\\n")
for suffix, tpr in (("DiscROC.txt", {disc}), ("ContROC.txt", {cont})):
    with open(args["-r"] + suffix, "w") as f:
        f.write("0.9990 2500\\n")
        f.write("%.4f 999\\n" % tpr)
        f.write("0.5000 100\\n")
'''


def _write_images(paths_and_imgs):
    import cv2
    for path, img in paths_and_imgs:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 100])


def _samples(n_images, im_size, seed):
    return synth_wider.make_images(n_images, im_size, 1, seed=seed)


def build_afw(root, n_images=3, im_size=96, seed=0):
    """AFW layout; returns the relative image paths listed."""
    samples = _samples(n_images, im_size, seed)
    rels = [f"testimages/afw_{i}.jpg" for i in range(n_images)]
    _write_images([(os.path.join(root, rel), img)
                   for rel, (img, _) in zip(rels, samples)])
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "afw_img_list.txt"), "w") as f:
        f.writelines(rel + "\n" for rel in rels)
    return rels


def build_fddb(root, n_images=3, im_size=96, seed=1, with_binary=True):
    """FDDB layout (+ stub evaluate binary); returns the extension-less
    relative image names in val.txt order."""
    samples = _samples(n_images, im_size, seed)
    names = [f"2002/07/25/big/img_{i}" for i in range(n_images)]
    _write_images([(os.path.join(root, name + ".jpg"), img)
                   for name, (img, _) in zip(names, samples)])
    folds = os.path.join(root, "FDDB-folds")
    os.makedirs(folds, exist_ok=True)
    with open(os.path.join(folds, "val.txt"), "w") as f:
        f.writelines(name + "\n" for name in names)
    # ellipse ground truth, consumed only by the (stub) binary
    with open(os.path.join(folds, "val_gt.txt"), "w") as f:
        for name, (img, boxes) in zip(names, samples):
            f.write(name + "\n")
            f.write(f"{len(boxes)}\n")
            for x1, y1, x2, y2 in boxes:
                ra, rb = (x2 - x1) / 2, (y2 - y1) / 2
                f.write(f"{rb:.3f} {ra:.3f} 0.0 "
                        f"{(x1 + x2) / 2:.3f} {(y1 + y2) / 2:.3f} 1\n")
    if with_binary:
        bdir = os.path.join(root, "evaluation")
        os.makedirs(bdir, exist_ok=True)
        bpath = os.path.join(bdir, "evaluate")
        with open(bpath, "w") as f:
            f.write(_STUB_EVALUATE.format(disc=STUB_DISC_TPR,
                                          cont=STUB_CONT_TPR))
        os.chmod(bpath, os.stat(bpath).st_mode | stat.S_IXUSR
                 | stat.S_IXGRP | stat.S_IXOTH)
    return names


def build_pascal(root, n_images=3, im_size=96, seed=2):
    """Pascal Faces layout; returns the image file names listed."""
    samples = _samples(n_images, im_size, seed)
    names = [f"2008_{i:06d}.jpg" for i in range(n_images)]
    _write_images([(os.path.join(root, "images", name), img)
                   for name, (img, _) in zip(names, samples)])
    with open(os.path.join(root, "pascal_img_list.txt"), "w") as f:
        f.writelines(name + "\n" for name in names)
    return names


def build_general(root, n_images=3, im_size=96, seed=3, ext="jpg"):
    """Nested-directory layout for the `general` walker; returns the
    absolute image paths in the order os.walk visits them."""
    samples = _samples(n_images, im_size, seed)
    paths = []
    for i, (img, _) in enumerate(samples):
        sub = os.path.join(root, "camera_a" if i % 2 == 0 else
                           os.path.join("camera_b", "day1"))
        paths.append(os.path.join(sub, f"frame_{i}.{ext}"))
    _write_images(zip(paths, (img for img, _ in samples)))
    walked = []
    for r, _dirs, files in os.walk(root):
        for fname in files:
            if fname.endswith(f".{ext}"):
                walked.append(os.path.join(r, fname))
    return walked
