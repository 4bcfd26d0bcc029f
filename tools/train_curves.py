#!/usr/bin/env python
"""Parse reference-format results-txt files (per-epoch blocks written by
utils/logging.ResultsWriter, format ref: train_utils/distributed_utils.py:
115-125 + train.py:152-164) into a per-epoch CSV and a compact curve
summary for PERF.md.

Usage: python tools/train_curves.py run1_results.txt [run2_results.txt ...]
       writes <input>.csv next to each input and prints a markdown summary.
"""

from __future__ import annotations

import re
import sys


def parse_results(path: str):
    """Returns list of dicts: epoch, loss, lr, mean_iou, dice."""
    epochs = []
    cur = None
    for line in open(path):
        m = re.match(r"\[epoch: (\d+)\]", line)
        if m:
            cur = {"epoch": int(m.group(1))}
            epochs.append(cur)
            continue
        if cur is None:
            continue
        m = re.match(r"train_loss: ([\d.eE+-]+)", line)
        if m:
            cur["loss"] = float(m.group(1))
        m = re.match(r"lr: ([\d.eE+-]+)", line)
        if m:
            cur["lr"] = float(m.group(1))
        m = re.search(r"mean IoU: ([\d.]+)", line)
        if m:
            cur["mean_iou"] = float(m.group(1))
        m = re.match(r"dice coefficient: ([\d.]+)", line)
        if m:
            cur["dice"] = float(m.group(1))
    return [e for e in epochs if "dice" in e]


def plot_curves(path: str, rows):
    """<input>.png: train-loss (log) + val dice/mIoU per epoch — the
    decreasing-loss/rising-dice artifact for the on-chip training proof."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ep = [r["epoch"] for r in rows]
    fig, ax1 = plt.subplots(figsize=(7, 4))
    ax1.plot(ep, [r.get("loss") for r in rows], color="#444444", lw=1.5,
             label="train loss")
    ax1.set_yscale("log")
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("train loss (log)")
    ax2 = ax1.twinx()
    ax2.plot(ep, [r["dice"] for r in rows], color="#1f77b4", lw=1.5,
             label="val dice")
    ax2.plot(ep, [r.get("mean_iou", float("nan")) / 100 for r in rows],
             color="#2ca02c", lw=1.0, ls="--", label="val mIoU/100")
    ax2.set_ylabel("val dice / mIoU")
    lines = ax1.get_lines() + ax2.get_lines()
    ax1.legend(lines, [ln.get_label() for ln in lines], loc="center right",
               fontsize=8)
    ax1.set_title(path.rsplit("/", 1)[-1])
    fig.tight_layout()
    fig.savefig(path + ".png", dpi=110)
    plt.close(fig)
    print(f"wrote {path}.png")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    runs = {}
    for path in argv:
        rows = parse_results(path)
        runs[path] = rows
        out = path + ".csv"
        with open(out, "w") as f:
            f.write("epoch,train_loss,lr,mean_iou,dice\n")
            for r in rows:
                f.write(f"{r['epoch']},{r.get('loss', '')},{r.get('lr', '')},"
                        f"{r.get('mean_iou', '')},{r['dice']}\n")
        print(f"wrote {out} ({len(rows)} epochs)")
        try:
            plot_curves(path, rows)
        except Exception as e:  # matplotlib optional
            print(f"plot skipped: {type(e).__name__}: {e}")

    print("\n| run | epochs | first dice | ep10 | ep50 | last | best | "
          "final loss |")
    print("|---|---|---|---|---|---|---|---|")
    for path, rows in runs.items():
        if not rows:
            print(f"| {path} | 0 | - | - | - | - | - | - |")
            continue
        def at(n):
            match = [r for r in rows if r["epoch"] == n]
            return f"{match[0]['dice']:.3f}" if match else "-"
        best = max(r["dice"] for r in rows)
        print(f"| {path} | {len(rows)} | {rows[0]['dice']:.3f} | {at(10)} | "
              f"{at(50)} | {rows[-1]['dice']:.3f} | {best:.3f} | "
              f"{rows[-1].get('loss', float('nan')):.4f} |")


if __name__ == "__main__":
    main()
