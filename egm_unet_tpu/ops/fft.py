"""Frequency-domain "enhancement" from the enhanced MCALayer.

The reference computes (ref: src/EGM-UNet.py:719-737):

    F        = fft2(x, norm='ortho')
    enhanced = ifft2(|F| * 1.1 * exp(i*angle(F)), norm='ortho').real

Scaling the magnitude while keeping the phase is just scaling the complex
spectrum: ``|F|*1.1*exp(i*angle(F)) == 1.1*F``, and the inverse transform of
``1.1*F`` is ``1.1*x`` exactly.  So on TPU this op is a single VPU multiply —
no FFT kernel needed.  ``exact=True`` keeps the literal FFT path for audit;
``tests/test_ops.py`` asserts the two paths agree to fp32 roundoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fft_magnitude_enhance(x: jax.Array, factor: float = 1.1, *, exact: bool = False) -> jax.Array:
    if not exact:
        return x * jnp.asarray(factor, x.dtype)
    xf = x.astype(jnp.float32)
    # NHWC: spatial axes are (1, 2); HW inputs use (0, 1).
    axes = (1, 2) if x.ndim >= 3 else (0, 1)
    f = jnp.fft.fft2(xf, axes=axes, norm="ortho")
    enhanced = jnp.abs(f) * factor * jnp.exp(1j * jnp.angle(f))
    return jnp.real(jnp.fft.ifft2(enhanced, axes=axes, norm="ortho")).astype(x.dtype)
