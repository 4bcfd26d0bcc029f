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


class TestHardSynthetic:
    """The discriminative generator (VERDICT r3 weak #4): the easy task was
    solved at epoch 0, so the training curves could not distinguish recipes.
    These pin the properties that make the hard task discriminative."""

    def test_deterministic_and_shapes(self):
        from egm_unet_tpu.data.synthetic import synthetic_tp_sample_hard

        a_img, a_m = synthetic_tp_sample_hard(5, 128, 160)
        b_img, b_m = synthetic_tp_sample_hard(5, 128, 160)
        assert a_img.shape == (128, 160, 3) and a_img.dtype == np.uint8
        assert a_m.shape == (128, 160) and set(np.unique(a_m)) <= {0, 1}
        assert (a_img == b_img).all() and (a_m == b_m).all()

    def test_band_fraction_sane(self):
        from egm_unet_tpu.data.synthetic import synthetic_tp_sample_hard

        fracs = [synthetic_tp_sample_hard(i)[1].mean() for i in range(6)]
        assert all(0.05 < f < 0.35 for f in fracs), fracs

    def test_color_shortcut_defeated(self):
        # a pure yellow-threshold detector must NOT solve the task: some
        # samples have yellow distractors off the band (false positives)
        # and some bands are low-contrast gray (false negatives)
        from egm_unet_tpu.data.synthetic import synthetic_tp_sample_hard

        ious = []
        for i in range(12):
            img, m = synthetic_tp_sample_hard(i)
            f = img.astype(np.float32) / 255
            yellow = (f[..., 0] > 0.5) & (f[..., 1] > 0.4) & (f[..., 2] < 0.45)
            inter = (yellow & (m > 0)).sum()
            union = (yellow | (m > 0)).sum()
            ious.append(inter / max(union, 1))
        assert np.mean(ious) < 0.75, ious  # easy task: ~0.9+

    def test_val_split_disjoint(self):
        # SyntheticTPDataset seed0 offsets must generate different samples
        # (the r03 proof's val set was literally the first train images)
        from egm_unet_tpu.data.synthetic import SyntheticTPDataset

        tr = SyntheticTPDataset(n=2, hard=True)
        va = SyntheticTPDataset(n=2, hard=True, seed0=500_000)
        assert not (tr[0][0] == va[0][0]).all()
        # and the easy generator honors seed0 the same way
        tr_e = SyntheticTPDataset(n=2)
        va_e = SyntheticTPDataset(n=2, seed0=500_000)
        assert not (tr_e[0][0] == va_e[0][0]).all()
