"""Tensor-parallel CLIP: 2-way model sharding must equal single-device."""

import numpy as np

import jax
import jax.numpy as jnp

from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig
from egm_unet_tpu.parallel import get_mesh
from egm_unet_tpu.parallel.tp import clip_param_specs, shard_clip_params

TINY = CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=2,
                  vision_width=64, vision_patch_size=16, context_length=16,
                  vocab_size=128, transformer_width=64, transformer_heads=2,
                  transformer_layers=2, long_clip=False)


def test_specs_shapes():
    model = CLIP(TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 16), jnp.int32))["params"]
    specs = clip_param_specs(params)
    blk = specs["text_resblock0"]
    assert blk["in_proj"]["kernel"] == jax.sharding.PartitionSpec(None, "model")
    assert blk["out_proj"]["kernel"] == jax.sharding.PartitionSpec("model", None)
    assert blk["c_fc"]["kernel"] == jax.sharding.PartitionSpec(None, "model")
    assert blk["c_proj"]["kernel"] == jax.sharding.PartitionSpec("model", None)
    assert specs["text_projection"] == jax.sharding.PartitionSpec()


def test_tp_matches_single_device(rng):
    model = CLIP(TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 16), jnp.int32))["params"]
    text = jnp.asarray(rng.integers(1, 120, (4, 16)).astype(np.int32))
    img = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))

    ref_t = model.apply({"params": params}, text, method=CLIP.encode_text)
    ref_i = model.apply({"params": params}, img, method=CLIP.encode_image)

    mesh = get_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        sharded = shard_clip_params(params, mesh)

        @jax.jit
        def enc_t(p, t):
            return model.apply({"params": p}, t, method=CLIP.encode_text)

        @jax.jit
        def enc_i(p, x):
            return model.apply({"params": p}, x, method=CLIP.encode_image)

        got_t = enc_t(sharded, text)
        got_i = enc_i(sharded, img)

    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               rtol=2e-4, atol=2e-4)
