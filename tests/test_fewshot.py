"""FewShotSegDataset (COCO-20i / Pascal-5i contract, ref:
datasets/coco_wrapper.py:21, pfe_dataset.py:11)."""

import numpy as np
import pytest

from egm_unet_tpu.data.fewshot import (COCO_CLASSES, FewShotSegDataset,
                                       make_synthetic_coco)
from egm_unet_tpu.data.fewshot_splits import coco_20i_fold


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    ann = make_synthetic_coco(str(root), n_images=9, n_classes=3)
    return str(root), ann


def test_episode_shapes_and_normalization(coco_root):
    root, ann = coco_root
    ds = FewShotSegDataset(ann, f"{root}/images", image_size=64)
    assert len(ds) == 9
    (q_img, s_img, s_seg), (q_seg, cls) = ds[0]
    assert q_img.shape == (64, 64, 3) and q_img.dtype == np.float32
    assert s_img.shape == (64, 64, 3) and s_seg.shape == (64, 64)
    assert q_seg.shape == (64, 64)
    assert set(np.unique(q_seg)) <= {0.0, 1.0}
    assert q_seg.sum() > 0  # the rectangle rasterized
    assert 0 <= cls < 3
    # ImageNet normalization applied (values centered, not 0..255)
    assert abs(float(q_img.mean())) < 3.0


def test_fold_filtering(coco_root):
    root, ann = coco_root
    train_ids, val_ids = coco_20i_fold(0, num_classes=4)
    ds = FewShotSegDataset(ann, f"{root}/images", class_ids=[0])
    classes = {ds[i][1][1] for i in range(len(ds))}
    assert classes == {0}
    assert len(ds) == 3  # 9 images round-robin over 3 classes


def test_mask_modes(coco_root):
    root, ann = coco_root
    for mode, arity in [("separate", 2), ("text_label", 1),
                        ("text_and_separate", 3), ("highlight", 1)]:
        ds = FewShotSegDataset(ann, f"{root}/images", image_size=48, mask=mode)
        inputs, _ = ds[1]
        assert len(inputs) == 1 + arity
        if mode == "text_label":
            assert inputs[1] in COCO_CLASSES


def test_negative_prob_zeroes_support(coco_root):
    root, ann = coco_root
    ds = FewShotSegDataset(ann, f"{root}/images", image_size=48,
                           negative_prob=1.0, seed=3)
    (_, _, s_seg), _ = ds[0]
    assert s_seg.sum() == 0  # ref: coco_wrapper.py:74-80
