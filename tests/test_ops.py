"""Numeric parity of core ops against PyTorch (the reference's substrate).

Each test builds the torch op from its documented formula (SURVEY.md §2) —
no reference code is imported — and checks our NHWC JAX op against it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from egm_unet_tpu import ops


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 1, 1, 1),
    (2, 0, 1, 1),
    (1, 12, 12, 1),   # GRFB dilated branch, visual=12
    (1, 1, 1, 4),     # grouped conv
    (1, 24, 24, 8),   # dilation 2*visual with groups
])
def test_conv2d_matches_torch(rng, stride, padding, dilation, groups):
    b, h, w, cin, cout, k = 2, 24, 24, 8, 16, 3
    x = rng.standard_normal((b, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((cout, cin // groups, k, k), dtype=np.float32)  # OIHW
    ref = F.conv2d(nchw(x), torch.from_numpy(wt), stride=stride,
                   padding=padding, dilation=dilation, groups=groups)
    w_hwio = np.transpose(wt, (2, 3, 1, 0))
    got = ops.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), stride=stride,
                     padding=padding, dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=2e-5, atol=2e-4)


def test_conv_transpose_nonoverlap(rng):
    b, h, w, cin, cout, k = 2, 7, 7, 12, 5, 16
    x = rng.standard_normal((b, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((cin, cout, k, k), dtype=np.float32)  # torch convT: (in, out, kh, kw)
    ref = F.conv_transpose2d(nchw(x), torch.from_numpy(wt), stride=k)
    w_ours = np.transpose(wt, (0, 2, 3, 1))  # (cin, kh, kw, cout)
    got = ops.conv_transpose2d_nonoverlap(jnp.asarray(x), jnp.asarray(w_ours))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("hw", [(24, 24), (25, 27)])
def test_max_pool_floor_mode(rng, hw):
    x = rng.standard_normal((2, *hw, 6), dtype=np.float32)
    ref = F.max_pool2d(nchw(x), 2, 2)
    got = ops.max_pool2d(jnp.asarray(x), 2, 2)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_avg_pool_count_include_pad(rng):
    x = rng.standard_normal((2, 16, 16, 4), dtype=np.float32)
    ref = F.avg_pool2d(nchw(x), 3, 1, 1)  # count_include_pad=True default
    got = ops.avg_pool2d(jnp.asarray(x), 3, 1, 1)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-5, atol=1e-5)


def test_min_pool(rng):
    x = rng.standard_normal((2, 16, 16, 4), dtype=np.float32)
    ref = -F.max_pool2d(-nchw(x), 3, 1, 1)
    got = ops.min_pool2d(jnp.asarray(x), 3, 1, 1)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_global_std_pool_unbiased(rng):
    x = rng.standard_normal((2, 9, 11, 4), dtype=np.float32)
    t = nchw(x)
    ref = t.view(2, 4, -1).std(dim=2).numpy()  # torch default: unbiased
    got = ops.global_std_pool(jnp.asarray(x))  # [B, C]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw,align", [
    ((30, 30), (60, 60), True),    # decoder upsample 2x
    ((15, 17), (30, 34), True),    # odd sizes
    ((352, 352), (120, 96), False),  # logit downsize, like eval fusion
    ((14, 14), (22, 22), False),
])
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw, align):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ref = F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    got = ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_upsample2x_helper(rng):
    x = rng.standard_normal((1, 30, 30, 8), dtype=np.float32)
    ref = F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=True)
    got = ops.upsample2x_bilinear_align_corners(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_upsample2x_layout_constraint_is_value_neutral(rng, monkeypatch):
    """$EGM_UP_LAYOUT pins the resize output's XLA layout (a perf
    measurement hook, PERF.md round 3) — values must be bit-identical."""
    import jax

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    base = np.asarray(jax.jit(ops.upsample2x_bilinear_align_corners)(x))
    monkeypatch.setenv("EGM_UP_LAYOUT", "1,2,0,3")
    got = np.asarray(
        jax.jit(lambda v: ops.upsample2x_bilinear_align_corners(v))(x))
    np.testing.assert_array_equal(got, base)


def test_resize_nearest_torch_mode(rng):
    x = rng.standard_normal((2, 13, 17, 2), dtype=np.float32)
    ref = F.interpolate(nchw(x), size=(29, 8), mode="nearest")
    got = ops.resize_nearest(jnp.asarray(x), (29, 8), mode="torch")
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=0, atol=0)


def test_resize_nearest_pil_mode(rng):
    from PIL import Image

    arr = (rng.integers(0, 255, size=(23, 31)) ).astype(np.uint8)
    ref = np.asarray(Image.fromarray(arr).resize((17, 45), Image.NEAREST))  # (W, H)
    got = ops.resize_nearest(jnp.asarray(arr.astype(np.float32)), (45, 17), mode="pil")
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint8), ref)


def test_resize_bicubic_matches_torch(rng):
    from egm_unet_tpu.ops.resize import resize_bicubic

    x = rng.standard_normal((1, 14, 14, 16), dtype=np.float32)
    ref = F.interpolate(nchw(x), size=(22, 22), mode="bicubic", align_corners=False)
    got = resize_bicubic(jnp.asarray(x), (22, 22), align_corners=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-3, atol=1e-3)


def test_fft_enhancement_is_scalar_multiply(rng):
    """The reference's fft->|.|*1.1->ifft equals 1.1*x (see ops/fft.py)."""
    x = rng.standard_normal((2, 30, 30, 8), dtype=np.float32)
    xj = jnp.asarray(x)
    fast = ops.fft_magnitude_enhance(xj)
    exact = ops.fft_magnitude_enhance(xj, exact=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), rtol=1e-5, atol=1e-5)
    # and both match the torch formula
    t = nchw(x)
    f = torch.fft.fft2(t, norm="ortho")
    enhanced = torch.abs(f) * 1.1 * torch.exp(1j * torch.angle(f))
    ref = torch.fft.ifft2(enhanced, norm="ortho").real
    np.testing.assert_allclose(np.asarray(fast), to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_channel_shuffle(rng):
    x = rng.standard_normal((2, 5, 5, 8), dtype=np.float32)
    t = nchw(x)
    b, c, h, w = t.shape
    ref = t.view(b, 4, c // 4, h, w).transpose(1, 2).contiguous().view(b, c, h, w)
    got = ops.channel_shuffle(jnp.asarray(x), groups=4)
    np.testing.assert_array_equal(np.asarray(got), to_nhwc(ref))


@pytest.mark.parametrize("name", ["LAPLACE4", "LAPLACE8", "SOBEL_X", "SOBEL_Y"])
def test_stencils(rng, name):
    k = np.asarray(getattr(ops, name))
    x = rng.standard_normal((2, 12, 12), dtype=np.float32)
    ref = F.conv2d(torch.from_numpy(x)[:, None], torch.from_numpy(k)[None, None], padding=1)
    got = ops.stencil2d(jnp.asarray(x), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(got), ref.numpy()[:, 0], rtol=1e-5, atol=1e-5)
