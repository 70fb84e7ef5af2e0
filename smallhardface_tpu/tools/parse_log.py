"""Training-log parser — the tools/extra/parse_log.py analog
(/root/reference/caffe/tools/extra/parse_log.py): extracts per-iteration
scalars from stderr.log / console logs into CSV for plotting.

Usage: python -m smallhardface_tpu.tools.parse_log stderr.log [out.csv]
"""

from __future__ import annotations

import csv
import re
import sys

LINE_RE = re.compile(
    r"iter (\d+)/(\d+) cls_loss: ([\d.eE+-]+) reg_loss: ([\d.eE+-]+) "
    r"(?:smoothed_loss: ([\d.eE+-]+) )?"
    r"accuracy: ([\d.eE+-]+) lr: ([\d.eE+-]+)"
    r".*?speed: ([\d.eE+-]+) iter/s")


def parse(path):
    rows = []
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if m:
                it, total, cls_l, reg_l, smoothed, acc, lr, speed = \
                    m.groups()
                rows.append({
                    "iteration": int(it),
                    "cls_loss": float(cls_l),
                    "reg_loss": float(reg_l),
                    "total_loss": float(cls_l) + float(reg_l),
                    "smoothed_loss": (float(smoothed) if smoothed
                                      else float(cls_l) + float(reg_l)),
                    "accuracy": float(acc),
                    "lr": float(lr),
                    "speed_iter_per_s": float(speed),
                })
    return rows


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    rows = parse(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else None
    fields = ["iteration", "cls_loss", "reg_loss", "total_loss",
              "smoothed_loss", "accuracy", "lr", "speed_iter_per_s"]
    fp = open(out, "w", newline="") if out else sys.stdout
    writer = csv.DictWriter(fp, fieldnames=fields)
    writer.writeheader()
    writer.writerows(rows)
    if out:
        fp.close()
        print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
