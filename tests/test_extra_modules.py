"""Tests for the auxiliary (reference-dead-code) modules."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from egm_unet_tpu.nn.extra import ELA, HEGDC, WConv2d, scharr_conv, sobel_conv


def test_scharr_conv_matches_torch(rng):
    c = 4
    x = rng.standard_normal((2, 12, 12, c), dtype=np.float32)
    kx = torch.tensor([[3., 0, -3], [10, 0, -10], [3, 0, -3]])
    ky = torch.tensor([[3., 10, 3], [0, 0, 0], [-3, -10, -3]])
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    gx = F.conv2d(t, kx[None, None].expand(c, 1, 3, 3), padding=1, groups=c)
    gy = F.conv2d(t, ky[None, None].expand(c, 1, 3, 3), padding=1, groups=c)
    ref = torch.sqrt(gx**2 + gy**2)
    got = scharr_conv(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_sobel_conv_is_xy_sum(rng):
    c = 3
    x = rng.standard_normal((1, 10, 10, c), dtype=np.float32)
    s = torch.tensor([[1., 2, 1], [0, 0, 0], [-1, -2, -1]])
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = (F.conv2d(t, s.T[None, None].expand(c, 1, 3, 3), padding=1, groups=c)
           + F.conv2d(t, s[None, None].expand(c, 1, 3, 3), padding=1, groups=c))
    got = sobel_conv(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_ela_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 32), dtype=np.float32))
    m = ELA()
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_wconv2d_phi_scaling(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    m = WConv2d(features=6, den=(0.5,))
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 6)
    # den=1 -> Phi all ones -> plain conv * alpha
    m1 = WConv2d(features=6, den=(1.0,))
    y1 = m1.apply(v, x)
    w = v["params"]["weight"]
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_hegdc_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    m = HEGDC(features=12)
    v = m.init(jax.random.key(0), x, train=True)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 16, 16, 12)
    assert np.isfinite(np.asarray(y)).all()
    # edge bank is stop-gradiented: grads flow only to learnable parts
    def loss(p):
        return jnp.sum(m.apply({"params": p,
                                "batch_stats": v["batch_stats"]}, x)**2)
    g = jax.grad(loss)(v["params"])
    assert float(jnp.abs(g["conv1_kernel"]).max()) > 0
