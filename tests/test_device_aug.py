"""Device-side augmentation tests."""

import numpy as np

import jax
import jax.numpy as jnp

from egm_unet_tpu.data.device_aug import augment_batch
from egm_unet_tpu.data.transforms import TP_MEAN, TP_STD


def make_batch(rng, b=4, h=128, w=160):
    imgs = rng.random((b, h, w, 3), dtype=np.float32)
    masks = (rng.random((b, h, w)) > 0.7).astype(np.int32)
    return jnp.asarray(imgs), jnp.asarray(masks)


def test_shapes_and_dtypes(rng):
    imgs, masks = make_batch(rng)
    out_i, out_m = augment_batch(jax.random.key(0), imgs, masks,
                                 jnp.asarray(TP_MEAN), jnp.asarray(TP_STD),
                                 crop_size=96, min_size=64, max_size=160)
    assert out_i.shape == (4, 96, 96, 3) and out_m.shape == (4, 96, 96)
    assert np.isfinite(np.asarray(out_i)).all()
    assert set(np.unique(np.asarray(out_m))) <= {0, 1}


def test_identity_scale_recovers_crop(rng):
    """With scale forced to 1 (min=max=short side) and the full frame
    covered, the augmentation must reproduce the source up to flips."""
    imgs, masks = make_batch(rng, b=2, h=96, w=96)
    out_i, out_m = augment_batch(jax.random.key(1), imgs, masks,
                                 jnp.zeros(3), jnp.ones(3),
                                 crop_size=96, min_size=96, max_size=96)
    for i in range(2):
        src = np.asarray(imgs[i])
        got = np.asarray(out_i[i])
        candidates = [src, src[:, ::-1], src[::-1], src[::-1, ::-1]]
        assert any(np.allclose(got, c, atol=1e-5) for c in candidates)


def test_determinism_and_variety(rng):
    imgs, masks = make_batch(rng)
    a1 = augment_batch(jax.random.key(7), imgs, masks, jnp.zeros(3), jnp.ones(3),
                       crop_size=64, min_size=48, max_size=128)
    a2 = augment_batch(jax.random.key(7), imgs, masks, jnp.zeros(3), jnp.ones(3),
                       crop_size=64, min_size=48, max_size=128)
    b = augment_batch(jax.random.key(8), imgs, masks, jnp.zeros(3), jnp.ones(3),
                      crop_size=64, min_size=48, max_size=128)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    assert not np.allclose(np.asarray(a1[0]), np.asarray(b[0]))


def test_small_scale_pads_with_fill(rng):
    """Scaled image smaller than the crop -> 0-image/0-mask padding
    (ref: transforms.py:72-73 pad fills)."""
    imgs, masks = make_batch(rng, b=1, h=100, w=100)
    masks = jnp.ones_like(masks)
    out_i, out_m = augment_batch(jax.random.key(0), imgs + 1.0, masks,
                                 jnp.zeros(3), jnp.ones(3),
                                 crop_size=96, min_size=40, max_size=40)
    # scaled to 40x40 inside a 96 crop: most of the frame is fill
    m = np.asarray(out_m)
    assert (m == 0).sum() > 96 * 96 * 0.5
    assert (m == 1).sum() > 0
