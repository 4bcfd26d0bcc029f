"""Fused 2x bilinear(align_corners=True) upsample Pallas kernel
(ops/pallas/resize2x.py) vs the XLA interpolation-matrix path, and its
integration behind $EGM_UPSAMPLE_IMPL=pallas.

Interpret-mode only in CI — bench.py --verify-kernels re-runs the compiled
kernel on the live TPU backend (Mosaic lowering differences are invisible
here; see PERF.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.ops.pallas.resize2x import supported, upsample2x_fused
from egm_unet_tpu.ops.resize import upsample2x_bilinear_align_corners


@pytest.mark.parametrize("shape,dtype", [
    ((2, 32, 32, 256), jnp.float32),   # up1 @ 512 input
    ((1, 64, 64, 128), jnp.float32),   # up2
    ((2, 128, 128, 64), jnp.bfloat16),  # up3
    ((1, 256, 256, 32), jnp.bfloat16),  # up4
    ((1, 16, 24, 8), jnp.float32),     # non-square
    ((3, 8, 8, 8), jnp.float32),       # minimum size
    ((1, 40, 56, 8), jnp.float32),     # H,W mult-of-8 but not of the chunk
])
def test_fused_matches_xla(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    ref = upsample2x_bilinear_align_corners(x.astype(jnp.float32))
    out = upsample2x_fused(x).astype(jnp.float32)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)


def test_band_chunk_variants():
    """Smaller bands/chunks than the defaults exercise the multi-chunk
    window and the zeroed second block."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 48, 16, 4)), jnp.float32)
    ref = upsample2x_bilinear_align_corners(x)
    # valid combos need the band's input window (~R/2+2 rows) to span at
    # most two chunks, i.e. Hc >= R/2 + 2
    for r, hc in [(16, 16), (32, 24), (8, 48)]:
        out = upsample2x_fused(x, band_rows=r, chunk_rows=hc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_supported_guard():
    assert supported(jnp.zeros((1, 32, 32, 8)))
    assert not supported(jnp.zeros((1, 30, 32, 8)))  # 480-class odd stage
    assert not supported(jnp.zeros((1, 32, 30, 8)))
    assert not supported(jnp.zeros((1, 32, 32, 3)))  # 2WC not a 128-multiple
    assert not supported(jnp.zeros((32, 32, 8)))


def test_env_impl_switch_and_fallback():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    ref = upsample2x_bilinear_align_corners(x, impl="matmul")
    out = upsample2x_bilinear_align_corners(x, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # odd sizes silently fall back to the matmul path
    y = jnp.asarray(rng.standard_normal((1, 30, 30, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(upsample2x_bilinear_align_corners(y, impl="pallas")),
        np.asarray(upsample2x_bilinear_align_corners(y, impl="matmul")),
        atol=1e-6)
    os.environ["EGM_UPSAMPLE_IMPL"] = "pallas"
    try:
        out_env = upsample2x_bilinear_align_corners(x)
    finally:
        del os.environ["EGM_UPSAMPLE_IMPL"]
    np.testing.assert_allclose(np.asarray(out_env), np.asarray(ref), atol=1e-5)
