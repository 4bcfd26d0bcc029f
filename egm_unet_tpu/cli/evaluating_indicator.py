"""Offline PNG-vs-PNG evaluator (ref: evaluating_indicator.py:263-524):
fast_hist confusion over name lists with /255 binarization, per-class
IoU/Recall/Precision/Accuracy, Fbeta and dice, shape-mismatch skip, progress
prints, tee logging, and CSV/plot outputs."""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np


class Logger:
    """Tee stdout to a log file (ref: evaluating_indicator.py:276-286)."""

    def __init__(self, filename: str):
        self.terminal = sys.stdout
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        self.log = open(filename, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)

    def flush(self):
        self.terminal.flush()
        self.log.flush()


def fast_hist(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """bincount confusion (ref: evaluating_indicator.py:322-328)."""
    k = (a >= 0) & (a < n)
    return np.bincount(n * a[k].astype(int) + b[k], minlength=n**2).reshape(n, n)


def per_class_iu(hist):
    return np.diag(hist) / np.maximum(hist.sum(1) + hist.sum(0) - np.diag(hist), 1)


def per_class_pa_recall(hist):
    return np.diag(hist) / np.maximum(hist.sum(1), 1)


def per_class_precision(hist):
    return np.diag(hist) / np.maximum(hist.sum(0), 1)


def per_accuracy(hist):
    return np.sum(np.diag(hist)) / np.maximum(np.sum(hist), 1)


def f_score(precision, recall, beta: float = 1.0):
    """Fbeta (ref: evaluating_indicator.py:299-318)."""
    return ((1 + beta**2) * precision * recall /
            np.maximum(beta**2 * precision + recall, 1e-12))


def dice_equation(inter, a_sum, b_sum, eps=1e-6):
    return (2 * inter + eps) / (a_sum + b_sum + eps)


def compute_miou(gt_dir: str, pred_dir: str, name_list, num_classes: int = 2,
                 print_every: int = 10):
    """ref: evaluating_indicator.py:347-417 (binarize /255, skip on shape
    mismatch, progress print every 10)."""
    from PIL import Image

    hist = np.zeros((num_classes, num_classes), np.int64)
    skipped = 0
    for i, name in enumerate(name_list):
        gt_path = os.path.join(gt_dir, f"{name}.png")
        pred_path = os.path.join(pred_dir, f"{name}.png")
        if not (os.path.exists(gt_path) and os.path.exists(pred_path)):
            skipped += 1
            continue
        gt = np.asarray(Image.open(gt_path).convert("L"))
        pred = np.asarray(Image.open(pred_path).convert("L"))
        if gt.shape != pred.shape:
            print(f"skip {name}: shape {gt.shape} vs {pred.shape}")
            skipped += 1
            continue
        gt = np.clip(gt.astype(np.float64) / 255.0, 0, 1).round().astype(np.int64)
        pred = np.clip(pred.astype(np.float64) / 255.0, 0, 1).round().astype(np.int64)
        hist += fast_hist(gt.flatten(), pred.flatten(), num_classes)
        if (i + 1) % print_every == 0:
            print(f"[{i + 1}/{len(name_list)}] mIoU "
                  f"{100 * np.nanmean(per_class_iu(hist)):.2f}")
    return hist, skipped


def write_confusion_csv(hist, classes, path):
    """ref: evaluating_indicator.py:460-477."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + list(classes))
        for cls, row in zip(classes, hist):
            w.writerow([cls] + list(map(int, row)))


def maybe_plot_bars(values, labels, title, path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        plt.bar(labels, values)
        plt.title(title)
        plt.savefig(path, bbox_inches="tight")
        plt.close()
    except ImportError:
        pass  # plots are optional


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gt-dir", default="dataset/TP-Dataset/GroundTruth")
    p.add_argument("--txt-dir", default="dataset/TP-Dataset/Index/val.txt")
    p.add_argument("--pred-dir", default="predict/test")
    p.add_argument("--log-path", default="logs/eval.log")
    p.add_argument("--out-dir", default="logs")
    args = p.parse_args(argv)

    sys.stdout = Logger(args.log_path)
    classes = ["_background_", "Tactile_paving"]  # ref: :503

    with open(args.txt_dir) as f:
        names = [ln.strip() for ln in f if ln.strip()]

    hist, skipped = compute_miou(args.gt_dir, args.pred_dir, names, len(classes))
    iu = per_class_iu(hist)
    recall = per_class_pa_recall(hist)
    precision = per_class_precision(hist)
    print(f"mIoU: {100 * np.nanmean(iu):.2f}")
    print(f"mPA (recall): {100 * np.nanmean(recall):.2f}")
    print(f"precision: {100 * np.nanmean(precision):.2f}")
    print(f"accuracy: {100 * per_accuracy(hist):.2f}")
    print(f"F1: {100 * np.nanmean(f_score(precision, recall)):.2f}")
    print(f"skipped: {skipped}")

    os.makedirs(args.out_dir, exist_ok=True)
    write_confusion_csv(hist, classes, os.path.join(args.out_dir, "confusion_matrix.csv"))
    maybe_plot_bars(iu * 100, classes, "IoU", os.path.join(args.out_dir, "mIoU.png"))
    maybe_plot_bars(recall * 100, classes, "Recall", os.path.join(args.out_dir, "recall.png"))


if __name__ == "__main__":
    main()
