"""Round-trip parity against the REAL reference Long-CLIP source.

Instantiates the reference's clip/model.py CLIP class (stubbing its unused
torchvision import), randomly initializes a small Long-CLIP configuration
(context is hard-coded to 248 there — ref: clip/model.py:375), converts its
state_dict through utils/convert.clip_from_torch / infer_clip_config, and
asserts encode_image (CSA final block) and encode_text (dual pos-emb masked
sum, eot pooling) match at fp32.  Complements test_convert_real_reference.py
on the text-prompted pillar.
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
    if "torchvision" not in sys.modules:  # unused at runtime by CLIP itself
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tvt
        tvt.functional = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
    spec = importlib.util.spec_from_file_location("ref_clip_model", REF_CLIP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_real_clip_roundtrip(ref_clip):
    import jax.numpy as jnp

    from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig
    from egm_unet_tpu.utils.convert import clip_from_torch, infer_clip_config

    torch.manual_seed(0)
    tmodel = ref_clip.CLIP(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=248, vocab_size=100,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
        load_from_clip=False)
    with torch.no_grad():
        # positional_embedding_res is torch.empty in the reference (only the
        # checkpoint fills it); give it defined values for the comparison
        tmodel.positional_embedding_res.normal_(0, 0.01)
    tmodel = tmodel.float().eval()

    sd = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    cfg_kw = infer_clip_config(sd)
    assert cfg_kw["long_clip"] and cfg_kw["context_length"] == 248
    params = clip_from_torch(sd, cfg_kw["vision_layers"],
                             cfg_kw["transformer_layers"])
    fmodel = CLIP(CLIPConfig(**cfg_kw))

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    toks = rng.integers(1, 50, (2, 248)).astype(np.int64)
    toks[0, 13] = 99  # eot = strictly-largest token id (argmax pooling)
    toks[1, 200] = 99

    with torch.no_grad():
        ref_img = tmodel.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        ref_txt = tmodel.encode_text(torch.from_numpy(toks)).numpy()

    out_img = fmodel.apply({"params": params}, jnp.asarray(img),
                           method=fmodel.encode_image)
    out_txt = fmodel.apply({"params": params}, jnp.asarray(toks),
                           method=fmodel.encode_text)
    np.testing.assert_allclose(np.asarray(out_img), ref_img, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_txt), ref_txt, atol=2e-4, rtol=1e-3)
