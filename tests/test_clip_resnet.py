"""ModifiedResNet CLIP tower parity against the REAL reference source
(ref: clip/model.py:14-157), through the convert.py RN path.

The RN tower is dead code for every live reference script but reachable via
``clip.load`` on RN checkpoints; this certifies the rebuild end to end:
reference torch RN-CLIP state_dict -> infer_clip_config (tuple
vision_layers) -> clip_from_torch -> flax CLIP.encode_image/encode_text.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_CLIP = "/root/reference/clip/model.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_CLIP),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_clip():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tvt
        tvt.functional = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
    spec = importlib.util.spec_from_file_location("ref_clip_model_rn", REF_CLIP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rn_tower_roundtrip(ref_clip):
    import jax.numpy as jnp

    from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig
    from egm_unet_tpu.utils.convert import clip_from_torch, infer_clip_config

    torch.manual_seed(0)
    tmodel = ref_clip.CLIP(
        embed_dim=32, image_resolution=64, vision_layers=(2, 2, 2, 2),
        vision_width=16, vision_patch_size=None, context_length=248,
        vocab_size=100, transformer_width=64, transformer_heads=1,
        transformer_layers=2, load_from_clip=False)
    with torch.no_grad():
        tmodel.positional_embedding_res.normal_(0, 0.01)
        # randomize BN running stats so the parity covers the folded buffers
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tmodel = tmodel.float().eval()

    sd = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    cfg_kw = infer_clip_config(sd)
    assert cfg_kw["vision_layers"] == (2, 2, 2, 2)
    assert cfg_kw["image_resolution"] == 64
    assert cfg_kw["vision_width"] == 16
    params = clip_from_torch(sd, cfg_kw["vision_layers"],
                             cfg_kw["transformer_layers"])
    fmodel = CLIP(CLIPConfig(**cfg_kw))

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    toks = rng.integers(1, 50, (2, 248)).astype(np.int64)
    toks[0, 13] = 99
    toks[1, 200] = 99

    with torch.no_grad():
        # the reference's encode_image forwards csa=/return_all= kwargs that
        # ModifiedResNet.forward does not accept (it would TypeError on an RN
        # tower — a reference dead-code quirk), so drive the tower directly
        ref_img = tmodel.visual(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        ref_txt = tmodel.encode_text(torch.from_numpy(toks)).numpy()

    out_img = fmodel.apply({"params": params}, jnp.asarray(img),
                           method=fmodel.encode_image)
    out_txt = fmodel.apply({"params": params}, jnp.asarray(toks),
                           method=fmodel.encode_text)
    np.testing.assert_allclose(np.asarray(out_img), ref_img, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_txt), ref_txt, atol=2e-4, rtol=1e-3)

    # return_all_tokens path of the attention pool (ref: clip/model.py:88-103
    # returns [S, N, C]; ours is batch-major [B, S, C])
    with torch.no_grad():
        ref_all = tmodel.visual(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            return_all_tokens=True).numpy().transpose(1, 0, 2)
    out_all = fmodel.apply({"params": params}, jnp.asarray(img), return_all=True,
                           method=fmodel.encode_image)
    np.testing.assert_allclose(np.asarray(out_all), ref_all, atol=5e-4, rtol=1e-3)


def test_soft_pooling_2d():
    """soft_pooling_2d vs the reference formula (src/EGM-UNet.py:804-826)."""
    import jax.numpy as jnp

    from egm_unet_tpu.nn.extra import soft_pooling_2d

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    flat = t.reshape(2, 3, -1)
    x_exp = torch.exp(flat)
    ref = (torch.sum(x_exp * flat, dim=2, keepdim=True)
           / torch.sum(x_exp, dim=2, keepdim=True)).reshape(2, 3, 1, 1)
    out = soft_pooling_2d(jnp.asarray(x))  # [B,1,1,C]
    np.testing.assert_allclose(
        np.asarray(out)[:, 0, 0, :], ref[:, :, 0, 0].numpy(), atol=1e-5, rtol=1e-5)
