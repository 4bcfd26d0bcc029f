"""Few-shot split logic + CLIPSeg fixed-interval metrics tests."""

import numpy as np

import jax.numpy as jnp

from egm_unet_tpu.data.fewshot_splits import (
    PASCAL_CLASSES,
    coco_20i_fold,
    filter_phrases_for_split,
    pascal_5i_fold,
    pascal_zeroshot_unseen,
)
from egm_unet_tpu.engine.clipseg_metrics import (
    accumulate,
    fixed_interval_metrics,
    threshold_counts,
)


def test_pascal_5i_folds_partition():
    all_novel = []
    for f in range(4):
        novel, base = pascal_5i_fold(f)
        assert len(novel) == 5 and len(base) == 15
        assert set(novel) | set(base) == set(PASCAL_CLASSES)
        all_novel += novel
    assert sorted(all_novel) == sorted(PASCAL_CLASSES)


def test_coco_20i_interleaved():
    novel, base = coco_20i_fold(1)
    assert len(novel) == 20 and novel[:3] == [1, 5, 9]
    assert set(novel) & set(base) == set()


def test_zeroshot_accumulation():
    assert pascal_zeroshot_unseen(2) == ["cow", "motorbike"]
    assert pascal_zeroshot_unseen(4) == ["cow", "motorbike", "aeroplane", "sofa"]
    assert len(pascal_zeroshot_unseen(10)) == 10


def test_phrase_filtering():
    phrases = ["a red car on the road", "the striped cat", "green grass",
               "a man riding a motorcycle"]
    kept = filter_phrases_for_split(phrases, ["cat", "motorbike"])
    assert kept == ["a red car on the road", "green grass"]
    only = filter_phrases_for_split(phrases, ["cat"], remove_classes=False)
    assert only == ["the striped cat"]


def test_fixed_interval_metrics_perfect():
    probs = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    segs = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    total = accumulate(None, threshold_counts(probs, segs))
    m = fixed_interval_metrics(total)
    assert m["fgiou_0.5"] == 1.0 and m["miou_0.3"] == 1.0
    assert m["ap"] > 0.95


def test_fixed_interval_metrics_batched_accumulation(rng):
    segs = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    probs = np.clip(segs * 0.8 + rng.random((2, 8, 8)) * 0.2, 0, 1).astype(np.float32)
    t1 = threshold_counts(jnp.asarray(probs[:1]), jnp.asarray(segs[:1]))
    t2 = threshold_counts(jnp.asarray(probs[1:]), jnp.asarray(segs[1:]))
    both = threshold_counts(jnp.asarray(probs), jnp.asarray(segs))
    acc = accumulate(t1, t2)
    for k in both:
        np.testing.assert_array_equal(np.asarray(acc[k]), np.asarray(both[k]))
    m = fixed_interval_metrics(both)
    assert 0.5 < m["best_fgiou"] <= 1.0
