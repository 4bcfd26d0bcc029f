"""Paired-transform semantics (ref: transforms.py)."""

import numpy as np

from egm_unet_tpu.data.transforms import (
    EvalTransform,
    TrainTransform,
    center_crop,
    pad_if_smaller,
    resize_short_side,
)


def test_center_crop_even_and_odd():
    img = np.arange(7 * 9 * 3, dtype=np.uint8).reshape(7, 9, 3)
    tgt = np.arange(7 * 9, dtype=np.int32).reshape(7, 9)
    ci, ct = center_crop(img, tgt, 5)
    assert ci.shape == (5, 5, 3) and ct.shape == (5, 5)
    # torchvision: top=int(round((7-5)/2))=1, left=int(round((9-5)/2))=2
    np.testing.assert_array_equal(ci, img[1:6, 2:7])
    np.testing.assert_array_equal(ct, tgt[1:6, 2:7])
    # odd diff: h=7,size=4 -> round(1.5)=2 (banker's)
    ci4, _ = center_crop(img, tgt, 4)
    np.testing.assert_array_equal(ci4, img[2:6, 2:6])  # left round(2.5)=2


def test_center_crop_pads_when_smaller():
    img = np.ones((3, 3, 3), np.uint8) * 7
    tgt = np.ones((3, 3), np.int32)
    ci, ct = center_crop(img, tgt, 5)
    assert ci.shape == (5, 5, 3) and ct.shape == (5, 5)
    # original content centered, zero fill around
    assert (ci[1:4, 1:4] == 7).all()
    assert ci[0].sum() == 0 and ci[-1].sum() == 0
    assert ct.sum() == 9


def test_train_transform_shapes_and_range():
    tf = TrainTransform(base_size=64, crop_size=48, seed=0)
    img = np.random.default_rng(0).integers(0, 255, (80, 60, 3), np.uint8)
    tgt = (np.random.default_rng(1).random((80, 60)) > 0.5).astype(np.uint8)
    out_i, out_t = tf(img, tgt)
    assert out_i.shape == (48, 48, 3) and out_t.shape == (48, 48)
    assert out_t.dtype == np.int32 and set(np.unique(out_t)) <= {0, 1}


def test_pad_if_smaller_noop_and_fill():
    a = np.ones((5, 5), np.uint8)
    assert pad_if_smaller(a, 4) is a
    p = pad_if_smaller(a, 8, fill=255)
    assert p.shape == (8, 8) and p[7, 7] == 255 and p[0, 0] == 1
