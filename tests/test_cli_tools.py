"""CLI tool tests: offline evaluator golden values, dataset audit, palette,
mean/std tool, argparse contracts."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from egm_unet_tpu.cli.compute_mean_std import compute_mean_std
from egm_unet_tpu.cli.dataset_audit import analyze_pixel_values
from egm_unet_tpu.cli.evaluating_indicator import (
    compute_miou,
    f_score,
    fast_hist,
    per_accuracy,
    per_class_iu,
    per_class_pa_recall,
    per_class_precision,
)
from egm_unet_tpu.utils.colormap import pascal_voc_palette, save_mask_png


def write_mask(path, arr):
    Image.fromarray(arr.astype(np.uint8)).save(path)


def test_fast_hist_golden():
    a = np.array([0, 0, 1, 1, 255])  # 255 out of range -> dropped
    b = np.array([0, 1, 1, 1, 0])
    h = fast_hist(a, b, 2)
    np.testing.assert_array_equal(h, [[1, 1], [0, 2]])


def test_metric_formulas_golden():
    hist = np.array([[90, 10], [5, 95]], np.int64)
    np.testing.assert_allclose(per_class_iu(hist), [90 / 105, 95 / 110])
    np.testing.assert_allclose(per_class_pa_recall(hist), [0.9, 0.95])
    np.testing.assert_allclose(per_class_precision(hist), [90 / 95, 95 / 105])
    np.testing.assert_allclose(per_accuracy(hist), 185 / 200)
    p, r = 0.8, 0.6
    np.testing.assert_allclose(f_score(p, r), 2 * p * r / (p + r))


def test_compute_miou_png_roundtrip(tmp_path):
    """PNG-vs-PNG acceptance semantics (ref: evaluating_indicator.py:347-417):
    /255 binarization, shape-mismatch skip."""
    gt_dir, pred_dir = tmp_path / "gt", tmp_path / "pred"
    gt_dir.mkdir(), pred_dir.mkdir()
    # perfect prediction
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 255
    write_mask(gt_dir / "a.png", m)
    write_mask(pred_dir / "a.png", m)
    # inverted prediction
    write_mask(gt_dir / "b.png", m)
    write_mask(pred_dir / "b.png", 255 - m)
    # shape mismatch -> skipped
    write_mask(gt_dir / "c.png", m)
    write_mask(pred_dir / "c.png", np.zeros((10, 10), np.uint8))

    hist, skipped = compute_miou(str(gt_dir), str(pred_dir), ["a", "b", "c"], 2)
    assert skipped == 1
    # a: 100 fg correct + 300 bg correct; b: all wrong
    np.testing.assert_array_equal(hist, [[300, 300], [100, 100]])


def test_dataset_audit(tmp_path):
    m = np.zeros((8, 8), np.uint8)
    m[0, 0] = 255
    write_mask(tmp_path / "x.png", m)
    write_mask(tmp_path / "y.png", np.full((4, 4), 7, np.uint8))
    rep = analyze_pixel_values(str(tmp_path))
    assert rep["n_files"] == 2
    assert len(rep["files_with_255"]) == 1
    assert rep["histogram"][0] == 63 and rep["histogram"][255] == 1


def test_voc_palette_golden():
    pal = pascal_voc_palette()
    np.testing.assert_array_equal(pal[0], [0, 0, 0])
    np.testing.assert_array_equal(pal[1], [128, 0, 0])      # aeroplane
    np.testing.assert_array_equal(pal[15], [192, 128, 128])  # person
    np.testing.assert_array_equal(pal[21], [128, 64, 128])


def test_save_mask_png(tmp_path):
    mask = np.zeros((6, 6), np.int32)
    mask[2:4, 2:4] = 1
    p = str(tmp_path / "m.png")
    save_mask_png(mask, p, binary=True)
    back = np.asarray(Image.open(p))
    assert set(np.unique(back)) == {0, 255}


def test_compute_mean_std_tool(tmp_path):
    img = np.full((10, 10, 3), 128, np.uint8)
    Image.fromarray(img).save(tmp_path / "i.jpg")
    mean, std = compute_mean_std(str(tmp_path))
    np.testing.assert_allclose(mean, [128 / 255] * 3, atol=2e-2)
    np.testing.assert_allclose(std, [0, 0, 0], atol=2e-2)


def test_train_cli_arg_contract():
    """Flag names preserved from ref train.py:177-207."""
    from egm_unet_tpu.cli.train import parse_args

    args = parse_args(["--data-path", "/x", "-b", "4", "--epochs", "3",
                       "--lr", "0.01", "--momentum", "0.8",
                       "--weight-decay", "1e-5", "--resume", "ckpt",
                       "--start-epoch", "2", "--amp"])
    assert (args.data_path, args.batch_size, args.epochs) == ("/x", 4, 3)
    assert (args.lr, args.momentum, args.weight_decay) == (0.01, 0.8, 1e-5)
    assert args.resume == "ckpt" and args.start_epoch == 2 and args.amp


def test_device_prefetcher_and_narrowing():
    """DevicePrefetcher yields prepared batches in order and re-raises
    worker errors; narrow_for_transfer halves image bytes (bf16) and
    ships integer masks as uint8 (round-3 tunnel-H2D fix)."""
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    import pytest

    from egm_unet_tpu.data.loader import DevicePrefetcher, narrow_for_transfer

    batches = [(np.full((2, 4, 4, 3), i, np.float32),
                np.full((2, 4, 4), i, np.int64)) for i in range(5)]
    seen = list(DevicePrefetcher(batches, lambda b: (b[0] + 1, b[1])))
    assert len(seen) == 5
    assert all(float(im[0, 0, 0, 0]) == i + 1 for i, (im, _) in enumerate(seen))

    def boom(b):
        raise RuntimeError("prepare failed")

    with pytest.raises(RuntimeError, match="prepare failed"):
        list(DevicePrefetcher(batches, boom))

    im, tg = narrow_for_transfer(batches[3][0], batches[3][1], jnp.bfloat16)
    assert im.dtype == ml_dtypes.bfloat16 and tg.dtype == np.uint8
    assert float(im[0, 0, 0, 0]) == 3.0 and int(tg[0, 0, 0]) == 3
    im32, tg32 = narrow_for_transfer(batches[3][0], batches[3][1], jnp.float32)
    assert im32.dtype == np.float32 and tg32.dtype == np.uint8
