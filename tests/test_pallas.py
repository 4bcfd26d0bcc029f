"""Pallas kernel correctness vs the XLA einsum reference (interpret mode on
the CPU mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from egm_unet_tpu.ops.attention import multi_head_attention
from egm_unet_tpu.ops.pallas.csa import csa_attention


@pytest.mark.parametrize("b,s,d,h", [
    (2, 10, 32, 4),    # unpadded odd seq
    (1, 64, 64, 1),    # aligned
    (2, 485, 768, 12),  # CLIPSeg dense size (22^2+1 tokens, ViT-B)
])
def test_csa_kernel_matches_einsum(rng, b, s, d, h):
    q = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32))
    ref = multi_head_attention(q, k, v, h, csa=True)
    got = csa_attention(q, k, v, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_csa_kernel_grad_matches_einsum(rng):
    """csa_attention is differentiable (custom_vjp: Pallas forward, XLA
    backward) — gradients wrt q/k/v match the einsum path.  Regression for
    the CLIPSeg decoder fine-tune, which differentiates through the frozen
    tower's activations ('Linearization failed' without the VJP)."""
    import jax

    b, s, d, h = 2, 13, 64, 4
    q = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(csa_attention(q, k, v, h, interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(multi_head_attention(q, k, v, h, csa=True)))

    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_csa_kernel_bf16(rng):
    b, s, d, h = 1, 17, 64, 2
    q = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32), jnp.bfloat16)
    ref = multi_head_attention(q, k, v, h, csa=True)
    got = csa_attention(q, k, v, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)
