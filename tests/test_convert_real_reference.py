"""Round-trip parity against the REAL reference model source.

Loads /root/reference/src/EGM-UNet.py itself (the way the user does: rename
to src/GRFBUNet.py — here via importlib-by-path, stubbing its thop import),
randomly initializes the reference GRFBUNet, saves a train.py-format .pth
checkpoint (ref: train.py:152-156), converts it through
utils/convert_unet.load_egm_checkpoint, and asserts the flax model's logits
match the torch model at fp32.  This exercises the exact converter contract
a user's trained checkpoint would flow through (the published weights are
Baidu-pan-only, so a randomly-initialized real model is the strongest
available oracle).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODEL = "/root/reference/src/EGM-UNet.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_MODEL),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_module():
    if "thop" not in sys.modules:  # module-level `from thop import profile`
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = thop
    spec = importlib.util.spec_from_file_location("ref_grfbunet", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_and_checkpoint(ref_module, tmp_path, base_c):
    torch.manual_seed(0)
    model = ref_module.GRFBUNet(in_channels=3, num_classes=2, base_c=base_c)
    model.eval()
    # make BN running stats non-trivial, exactly like a trained model
    with torch.no_grad():
        model.train()
        for _ in range(2):
            model(torch.randn(2, 3, 64, 64))
        model.eval()
    path = str(tmp_path / "model_best.pth")
    torch.save({"model": model.state_dict(), "optimizer": {}, "epoch": 1}, path)
    return model, path


def test_real_reference_checkpoint_roundtrip(ref_module, tmp_path):
    import jax
    import jax.numpy as jnp

    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.utils.convert_unet import load_egm_checkpoint

    base_c = 16
    tmodel, path = _build_and_checkpoint(ref_module, tmp_path, base_c)
    params, stats = load_egm_checkpoint(path)

    fmodel = create_model("egm_unet", num_classes=2, base_c=base_c)
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))["out"]
    ref = ref.numpy().transpose(0, 2, 3, 1)

    out = fmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)["out"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)

    # converted params must be structurally identical to a fresh init
    init = fmodel.init(jax.random.key(0), jnp.asarray(x[:1]), train=False)
    assert jax.tree_util.tree_structure(jax.tree_util.tree_map(np.shape, params)) \
        == jax.tree_util.tree_structure(jax.tree_util.tree_map(np.shape, init["params"]))
    shapes_conv = jax.tree_util.tree_map(np.shape, params)
    shapes_init = jax.tree_util.tree_map(np.shape, init["params"])
    assert shapes_conv == shapes_init


def test_real_yuan_variant_roundtrip(tmp_path):
    """The A+B ablation snapshot (src/yuanGRFBUNet.py: DoubleConv1 without
    MCALayer) through the converter's use_mca=False path."""
    import importlib.util

    import jax.numpy as jnp

    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.utils.convert_unet import load_egm_checkpoint

    path_src = "/root/reference/src/yuanGRFBUNet.py"
    if not os.path.exists(path_src):
        pytest.skip("reference checkout not present")
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = thop
    spec = importlib.util.spec_from_file_location("ref_yuan", path_src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(1)
    tmodel = mod.GRFBUNet(in_channels=3, num_classes=2, base_c=8)
    with torch.no_grad():
        tmodel.train()
        tmodel(torch.randn(2, 3, 64, 64))
        tmodel.eval()
    path = str(tmp_path / "yuan.pth")
    torch.save({"model": tmodel.state_dict()}, path)

    params, stats = load_egm_checkpoint(path, use_mca=False)
    fmodel = create_model("egm_unet_ab", num_classes=2, base_c=8)
    x = np.random.default_rng(2).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))["out"]
    out = fmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)["out"]
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_real_reference_odd_size_forward(ref_module, tmp_path):
    """Odd spatial sizes hit the decoder's pad-to-match path
    (ref: src/EGM-UNet.py:940-945)."""
    import jax.numpy as jnp

    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.utils.convert_unet import load_egm_checkpoint

    tmodel, path = _build_and_checkpoint(ref_module, tmp_path, 8)
    params, stats = load_egm_checkpoint(path)
    fmodel = create_model("egm_unet", num_classes=2, base_c=8)

    x = np.random.default_rng(1).standard_normal((1, 70, 54, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))["out"]
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = fmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)["out"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
