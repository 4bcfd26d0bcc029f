"""Fused MCALayer Pallas kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.nn.attention import MCALayer


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 32, 24, 16),
                                   (2, 8, 8, 64)])
def test_mca_pallas_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    ref_layer = MCALayer(impl="xla")
    variables = ref_layer.init(jax.random.key(0), x)
    ref = ref_layer.apply(variables, x)

    out = MCALayer(impl="pallas").apply(variables, x)  # same params
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_mca_pallas_bf16():
    rng = np.random.default_rng(1)
    x32 = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    layer = MCALayer(impl="xla", dtype=jnp.bfloat16)
    variables = layer.init(jax.random.key(0), x32)
    x = x32.astype(jnp.bfloat16)
    ref = layer.apply(variables, x)
    out = MCALayer(impl="pallas", dtype=jnp.bfloat16).apply(variables, x)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_mca_pallas_odd_height_falls_back():
    """Heights with no power-of-two tiling still work (tile 1 worst case)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 10, 8)), jnp.float32)
    layer = MCALayer(impl="xla")
    variables = layer.init(jax.random.key(0), x)
    ref = layer.apply(variables, x)
    out = MCALayer(impl="pallas").apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
