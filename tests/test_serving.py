"""Batched serving API tests."""

import numpy as np

import jax

from egm_unet_tpu.models import create_model
from egm_unet_tpu.serving import Predictor, PredictorConfig


def make_predictor(base_size=96, batch_size=4):
    cfg = PredictorConfig(model_name="unet", base_c=8, base_size=base_size,
                          batch_size=batch_size, dtype="float32",
                          pad_multiple=32)
    model = create_model("unet", base_c=8)
    variables = model.init(jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32),
                           train=True)
    return Predictor({"params": variables["params"],
                      "batch_stats": variables["batch_stats"]}, cfg)


def test_mixed_sizes_and_counts(rng):
    pred = make_predictor()
    images = [
        (rng.random((120, 160, 3)) * 255).astype(np.uint8),
        (rng.random((100, 100, 3)) * 255).astype(np.uint8),
        (rng.random((120, 161, 3)) * 255).astype(np.uint8),
        (rng.random((120, 160, 3)) * 255).astype(np.uint8),
        (rng.random((90, 200, 3)) * 255).astype(np.uint8),
    ]
    masks = pred.predict(images)
    assert len(masks) == len(images)
    for img, mask in zip(images, masks):
        assert mask.shape == img.shape[:2]
        assert set(np.unique(mask)) <= {0, 1}


def test_batching_matches_single(rng):
    pred = make_predictor(batch_size=3)
    imgs = [(rng.random((100, 100, 3)) * 255).astype(np.uint8) for _ in range(5)]
    batched = pred.predict(imgs)
    singles = [pred.predict([im])[0] for im in imgs]
    for b, s in zip(batched, singles):
        np.testing.assert_array_equal(b, s)


def test_program_cache_reuse(rng):
    pred = make_predictor()
    imgs = [(rng.random((100, 100, 3)) * 255).astype(np.uint8) for _ in range(3)]
    pred.predict(imgs)
    n1 = len(pred._compiled)
    pred.predict(imgs)
    assert len(pred._compiled) == n1  # same bucket -> cached program
