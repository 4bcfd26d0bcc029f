"""PhraseCut pipeline + CLIPSeg BCE training tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from egm_unet_tpu.data.blend import blend_image_segmentation
from egm_unet_tpu.data.phrasecut import (
    PhraseCutDataset,
    find_crop,
    make_synthetic_phrasecut,
    polygon2mask,
)
from egm_unet_tpu.engine.clipseg_train import (
    bce_with_logits,
    clipseg_foreground_iou,
    cosine_schedule,
    create_clipseg_state,
    make_clipseg_train_step,
)
from egm_unet_tpu.models.clip.model import CLIPConfig
from egm_unet_tpu.models.clipseg import CLIPDensePredT

TINY = CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=3,
                  vision_width=64, vision_patch_size=16, context_length=24,
                  vocab_size=512, transformer_width=64, transformer_heads=2,
                  transformer_layers=3, long_clip=True)


def test_polygon2mask_square():
    m = polygon2mask((10, 10), [(2, 2), (2, 7), (7, 7), (7, 2)])
    assert m[4, 4] and not m[0, 0] and not m[9, 9]
    assert 16 <= m.sum() <= 36  # ~5x5 square


def test_polygon2mask_matches_skimage_convention():
    # triangle; verify winding-independence and bounds
    tri = [(1, 1), (8, 1), (1, 8)]
    m = polygon2mask((10, 10), tri)
    assert m[2, 2] and not m[8, 8]
    m_rev = polygon2mask((10, 10), tri[::-1])
    np.testing.assert_array_equal(m, m_rev)


def test_find_crop_prefers_foreground():
    rng = np.random.default_rng(0)
    seg = np.zeros((64, 64), bool)
    seg[40:60, 40:60] = True
    sly, slx, exceed = find_crop(seg, (24, 24), rng, iterations=200, min_frac=0.2)
    assert not exceed
    assert seg[sly, slx].mean() > 0.2


def test_find_crop_exceed_flag():
    rng = np.random.default_rng(0)
    seg = np.zeros((32, 32), bool)  # no foreground at all
    sly, slx, exceed = find_crop(seg, (16, 16), rng, iterations=10, min_frac=0.1)
    assert exceed


def test_phrasecut_dataset(tmp_path):
    root = make_synthetic_phrasecut(str(tmp_path), n=6)
    ds = PhraseCutDataset(root, "train", image_size=64, seed=0)
    assert len(ds) == 6
    img, seg, phrase = ds[0]
    assert img.shape == (64, 64, 3) and seg.shape == (64, 64)
    assert set(np.unique(seg)) <= {0.0, 1.0}
    assert seg.sum() > 0
    assert isinstance(phrase, str) and len(phrase) > 0


def test_phrasecut_negative_prompts(tmp_path):
    root = make_synthetic_phrasecut(str(tmp_path), n=6)
    ds = PhraseCutDataset(root, "train", image_size=64, negative_prob=1.0, seed=0)
    img, seg, phrase = ds[0]
    assert seg.sum() == 0  # negative sample zeroes the target
    assert phrase != ds.tasks[0]["phrase"]


@pytest.mark.parametrize("mode", ["overlay", "highlight", "highlight2", "shape",
                                  "concat", "image_only", "image_black",
                                  "separate", "blur3_highlight", "crop",
                                  "crop_blur_highlight"])
def test_blend_modes(rng, mode):
    img = rng.random((24, 24, 3), dtype=np.float32)
    seg = np.zeros((24, 24), np.float32)
    seg[8:16, 8:16] = 1
    out = blend_image_segmentation(img, seg, mode, image_size=16)
    assert isinstance(out, list) and len(out) in (1, 2)
    assert np.isfinite(out[0]).all()


def test_blend_matches_reference_formulas(rng):
    img = rng.random((8, 8, 3), dtype=np.float32)
    seg = (rng.random((8, 8)) > 0.5).astype(np.float32)
    np.testing.assert_allclose(
        blend_image_segmentation(img, seg, "overlay")[0], img * seg[..., None])
    np.testing.assert_allclose(
        blend_image_segmentation(img, seg, "highlight")[0],
        img * seg[..., None] * 0.85 + 0.15 * img, rtol=1e-6)


def test_bce_matches_torch(rng):
    logits = rng.standard_normal((4, 8, 8), dtype=np.float32)
    target = (rng.random((4, 8, 8)) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target))
    got = bce_with_logits(jnp.asarray(logits), jnp.asarray(target))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_cosine_schedule_matches_torch():
    lr, t_max, eta_min = 1e-3, 100, 1e-4
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max, eta_min=eta_min)
    ours = cosine_schedule(lr, t_max, eta_min)
    for step in range(0, t_max, 7):
        np.testing.assert_allclose(float(ours(step)), sch.get_last_lr()[0],
                                   rtol=1e-5, err_msg=f"step {step}")
        for _ in range(7):
            opt.step()
            sch.step()


def test_clipseg_bce_training_decreases_loss(rng, tmp_path):
    model = CLIPDensePredT(clip_cfg=TINY, extract_layers=(0, 1, 2), reduce_dim=16)
    state = create_clipseg_state(model, jax.random.key(0), (2, 32, 32, 3),
                                 lr=1e-3, t_max=100)
    # token conditioning path
    tokens = jnp.asarray(rng.integers(1, 500, (2, TINY.context_length)).astype(np.int32))
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    segs = jnp.zeros((2, 32, 32), jnp.float32).at[:, 8:24, 8:24].set(1.0)

    step = jax.jit(make_clipseg_train_step(model))
    losses = []
    for _ in range(6):
        state, aux = step(state, imgs, segs, tokens)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses


def test_clipseg_optimizer_masks_clip_tower(rng):
    model = CLIPDensePredT(clip_cfg=TINY, extract_layers=(0, 1, 2), reduce_dim=16)
    state = create_clipseg_state(model, jax.random.key(0), (1, 32, 32, 3))
    tokens = jnp.asarray(rng.integers(1, 500, (1, TINY.context_length)).astype(np.int32))
    imgs = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    segs = jnp.ones((1, 32, 32), jnp.float32)
    before = jax.tree_util.tree_leaves(state.params["clip"])
    step = jax.jit(make_clipseg_train_step(model))
    state, _ = step(state, imgs, segs, tokens)
    after = jax.tree_util.tree_leaves(state.params["clip"])
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fg_iou():
    logits = jnp.full((1, 4, 4), 10.0)  # all foreground
    segs = jnp.ones((1, 4, 4))
    assert float(clipseg_foreground_iou(logits, segs)) == 1.0
    assert float(clipseg_foreground_iou(-logits, segs)) == 0.0
