"""BN-folding parity: the fold_bn=True graph with folded params must match
the standard graph at eval exactly (fp32), for every BN site in the family
(ConvBNReLU, BasicConv, EdgeAwareFeatureEnhancer — nn/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.models import create_model
from egm_unet_tpu.models.fold_bn import fold_bn_variables


def _trained_variables(model, rng, steps=3, shape=(2, 48, 48, 3)):
    x0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=True)
    v = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    for _ in range(steps):  # make running stats non-trivial
        xb = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        _, upd = model.apply(v, xb, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    return v, x0


@pytest.mark.parametrize("name", ["egm_unet", "unet", "grfb_unet", "egm_unet_ab"])
def test_fold_bn_parity(name):
    rng = np.random.default_rng(0)
    model = create_model(name, base_c=8, num_classes=2)
    v, x0 = _trained_variables(model, rng)
    ref = model.apply(v, x0, train=False)["out"]

    fmodel = create_model(name, base_c=8, num_classes=2, fold_bn=True)
    fv = fold_bn_variables(v)

    # folded tree must exactly match the fold-graph's own init structure
    finit = fmodel.init(jax.random.key(1), x0, train=False)
    assert jax.tree_util.tree_structure(fv["params"]) == \
        jax.tree_util.tree_structure(finit["params"])
    assert "batch_stats" not in finit or not finit.get("batch_stats")

    out = fmodel.apply(fv, x0, train=False)["out"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_fold_bn_rejects_unpaired_bn():
    with pytest.raises(ValueError, match="no sibling"):
        fold_bn_variables({
            "params": {"BatchNorm_0": {"BatchNorm_0": {
                "scale": jnp.ones(4), "bias": jnp.zeros(4)}}},
            "batch_stats": {"BatchNorm_0": {"BatchNorm_0": {
                "mean": jnp.zeros(4), "var": jnp.ones(4)}}},
        })


def test_serving_predictor_folds_by_default():
    from egm_unet_tpu.serving import Predictor, PredictorConfig

    rng = np.random.default_rng(1)
    model = create_model("egm_unet", base_c=8, num_classes=2)
    v, _ = _trained_variables(model, rng)
    cfg = PredictorConfig(model_name="egm_unet", base_c=8, batch_size=2,
                          base_size=64, pad_multiple=32, dtype="float32")
    img = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)

    masks_fold = Predictor(v, cfg).predict([img])
    masks_raw = Predictor(
        v, PredictorConfig(**{**cfg.__dict__, "fold_bn": False})).predict([img])
    assert masks_fold[0].shape == img.shape[:2]
    np.testing.assert_array_equal(masks_fold[0], masks_raw[0])
