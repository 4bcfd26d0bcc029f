"""Shape/structure tests for the UNet family (all registry configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egm_unet_tpu.models import MODEL_CONFIGS, create_model


def init_and_run(model, x, train=False):
    variables = model.init(jax.random.key(0), x, train=True)
    out, _ = model.apply(variables, x, train=train,
                         mutable=["batch_stats"] if train else [])
    return variables, out


@pytest.mark.parametrize("name", ["unet", *MODEL_CONFIGS])
def test_forward_shapes(name):
    model = create_model(name, base_c=16)  # small for test speed
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _, out = init_and_run(model, x)
    assert out["out"].shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out["out"])).all()


def test_odd_size_padding():
    """Resize-565 short side gives odd maps; Up must pad to match skips
    (ref: src/EGM-UNet.py:940-945)."""
    model = create_model("unet", base_c=16)
    x = jnp.zeros((1, 69, 91, 3), jnp.float32)
    _, out = init_and_run(model, x)
    assert out["out"].shape == (1, 69, 91, 2)


def test_train_mode_updates_batch_stats():
    model = create_model("egm_unet", base_c=16)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    out, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_bf16_forward():
    model = create_model("egm_unet", base_c=16, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    _, out = init_and_run(model, x)
    assert out["out"].dtype == jnp.float32  # logits promoted for the loss
    assert np.isfinite(np.asarray(out["out"])).all()


def test_rga_split_sizes():
    from egm_unet_tpu.nn.attention import RecursiveGatedAttention

    rga = RecursiveGatedAttention(dim=256)
    x = jnp.zeros((1, 8, 8, 256))
    v = rga.init(jax.random.key(0), x)
    # proj_in: 256 -> 128 + 256 (ref: src/EGM-UNet.py:484 with order=2)
    assert v["params"]["proj_in"]["Conv_0"]["kernel"].shape == (1, 1, 256, 384)
    y = rga.apply(v, x)
    assert y.shape == x.shape


def test_mca_kernel_size_formula():
    from egm_unet_tpu.nn.attention import mca_kernel_size

    # ref: src/EGM-UNet.py:694-697
    assert mca_kernel_size(32) == 3
    assert mca_kernel_size(64) == 3
    assert mca_kernel_size(128) == 3   # round->4, even -> 3
    assert mca_kernel_size(256) == 5
