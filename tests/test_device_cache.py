"""Device-resident dataset cache tests (data/device_cache.py).

The cache is the zero-steady-state-transfer training path: raw uint8
sources live in HBM, each step ships only a [batch] index vector, and the
sentinel padding of the final partial batch must reproduce the host
collate's fills exactly (image 0, mask 255 — ref: my_dataset.py cat_list).
"""

import numpy as np

import jax
import jax.numpy as jnp

from egm_unet_tpu.data.device_cache import DeviceDatasetCache, build_cache_arrays
from egm_unet_tpu.data.synthetic import SyntheticTPDataset

SRC = 96
CROP = 48


def make_cache(n=5, out_dtype=None):
    ds = SyntheticTPDataset(n=n, h=100, w=120, cache=True)
    return DeviceDatasetCache(ds, SRC, jnp.zeros(3), jnp.ones(3),
                              crop_size=CROP, min_size=SRC // 2,
                              max_size=SRC, out_dtype=out_dtype), ds


def test_build_arrays_shapes_and_transform_restore():
    ds = SyntheticTPDataset(n=3, h=100, w=120)
    marker = object()
    ds.transforms = marker  # must be bypassed during the build and restored
    imgs, masks = build_cache_arrays(ds, SRC)
    assert ds.transforms is marker
    assert imgs.shape == (3, SRC, SRC, 3) and imgs.dtype == np.uint8
    assert masks.shape == (3, SRC, SRC) and masks.dtype == np.uint8
    assert imgs.max() > 1  # raw pixel range, not the /255'd float path
    assert set(np.unique(masks)) <= {0, 1}


def test_epoch_iter_batch_count_and_shapes():
    cache, _ = make_cache(n=5)
    batches = list(cache.epoch_iter(jax.random.key(0), 2,
                                    rng=np.random.default_rng(0)))
    assert len(batches) == 3  # ceil(5/2) — matches BatchLoader(drop_last=False)
    for im, tg in batches:
        assert im.shape == (2, CROP, CROP, 3)
        assert tg.shape == (2, CROP, CROP)
        assert tg.dtype == jnp.int32


def test_sentinel_padding_matches_collate_fills():
    cache, _ = make_cache(n=5)
    *_, (im, tg) = cache.epoch_iter(jax.random.key(0), 2,
                                    rng=np.random.default_rng(0))
    # 5 samples / batch 2: the last batch has one sentinel row
    assert np.asarray(im[1]).max() == 0.0  # image fill 0
    assert (np.asarray(tg[1]) == 255).all()  # mask fill 255 (loss ignore)
    # the real row is untouched by the sentinel masking
    assert set(np.unique(np.asarray(tg[0]))) <= {0, 1}


def test_deterministic_replay():
    """Same key + rng seed -> identical batches (the restart-proof property
    the train CLI's per-epoch fold_in relies on)."""
    cache, _ = make_cache(n=4)
    a = list(cache.epoch_iter(jax.random.key(3), 2,
                              rng=np.random.default_rng(7)))
    b = list(cache.epoch_iter(jax.random.key(3), 2,
                              rng=np.random.default_rng(7)))
    for (ia, ta), (ib, tb) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
    c = list(cache.epoch_iter(jax.random.key(4), 2,
                              rng=np.random.default_rng(7)))
    assert not np.allclose(np.asarray(a[0][0]), np.asarray(c[0][0]))


def test_matches_direct_augment_on_gathered_sources():
    """A full (no-sentinel) cached batch must equal augment_batch applied to
    the same gathered uint8 sources — the cache adds gather + /255 only."""
    from egm_unet_tpu.data.device_aug import augment_batch

    cache, _ = make_cache(n=4)
    rng = np.random.default_rng(5)
    order = rng.permutation(4)[:2].astype(np.int32)
    key = jax.random.key(9)
    _, k = jax.random.split(key)
    im_c, tg_c = cache._batch_fn(cache.imgs, cache.masks, k,
                                 jnp.asarray(order))
    src_i = jnp.asarray(np.asarray(cache.imgs)[order]).astype(jnp.float32) / 255.0
    src_m = jnp.asarray(np.asarray(cache.masks)[order]).astype(jnp.int32)
    im_d, tg_d = augment_batch(k, src_i, src_m, jnp.zeros(3), jnp.ones(3),
                               crop_size=CROP, min_size=SRC // 2, max_size=SRC)
    np.testing.assert_allclose(np.asarray(im_c), np.asarray(im_d),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(tg_c), np.asarray(tg_d))


def test_out_dtype_cast():
    cache, _ = make_cache(n=2, out_dtype=jnp.bfloat16)
    (im, _), = cache.epoch_iter(jax.random.key(0), 2,
                                rng=np.random.default_rng(0))
    assert im.dtype == jnp.bfloat16


def test_train_cli_device_cache_e2e(tmp_path):
    """One epoch through the CLI on the cached path: trains, evals, saves."""
    from egm_unet_tpu.cli.train import main

    main(["--synthetic", "--epochs", "1", "--model", "unet", "--base-c", "8",
          "--batch-size", "4", "--synthetic-size", "64", "--eval-size", "96",
          "--synthetic-n", "6", "--device-cache",
          "--save-dir", str(tmp_path / "w"),
          "--results-file", str(tmp_path / "r.txt")])
    assert (tmp_path / "r.txt").exists()
    assert (tmp_path / "w" / "0").exists()
