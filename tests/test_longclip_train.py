"""Long-CLIP contrastive fine-tune loss tests (ref: clip/model.py:572-614)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from egm_unet_tpu.engine.longclip_train import (
    MAX_LOGIT_SCALE,
    create_longclip_state,
    cross_entropy_smoothed,
    longclip_contrastive_loss,
    make_longclip_train_step,
    pca_reconstruct,
)
from egm_unet_tpu.parallel import get_mesh

torch.set_grad_enabled(False)


def test_pca_matches_torch(rng):
    x = rng.standard_normal((16, 12), dtype=np.float32)
    t = torch.from_numpy(x)
    mean = t.mean(dim=0)
    xc = t - mean
    _, _, vt = torch.linalg.svd(xc, full_matrices=False)
    pc = vt.T[:, :4]
    ref = (xc @ pc) @ pc.T + mean
    got = pca_reconstruct(jnp.asarray(x), 4)
    # SVD sign ambiguity cancels in project+reconstruct
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_smoothed_ce_matches_torch(rng):
    logits = rng.standard_normal((6, 10), dtype=np.float32)
    targets = rng.integers(0, 10, size=(6,))
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(targets),
                          label_smoothing=0.1)
    got = cross_entropy_smoothed(jnp.asarray(logits), jnp.asarray(targets), 0.1)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def torch_longclip_loss(img, tl, ts, logit_scale):
    """Single-process oracle of the reference's forward (world size 1)."""
    def norm(t):
        return t / t.norm(dim=1, keepdim=True)

    img, tl, ts = norm(img), norm(tl), norm(ts)
    mean = img.mean(dim=0)
    xc = img - mean
    _, _, vt = torch.linalg.svd(xc, full_matrices=False)
    pc = vt.T[:, :4]
    img_s = (xc @ pc) @ pc.T + mean

    scale = logit_scale.exp()
    # world=1: image_feat_all == image features, so sim_tl2i is the single
    # transpose of (img_all @ txt.T) (ref: clip/model.py:588-594)
    sim_i2tl = scale * img @ tl.T
    sim_tl2i = (scale * img @ tl.T).T
    sim_i2ts = scale * img_s @ ts.T
    sim_ts2i = (scale * img_s @ ts.T).T
    targets = torch.arange(img.shape[0])
    li = (F.cross_entropy(sim_i2tl, targets, label_smoothing=0.1)
          + F.cross_entropy(sim_tl2i, targets, label_smoothing=0.1)) / 2
    ls = (F.cross_entropy(sim_i2ts, targets, label_smoothing=0.1)
          + F.cross_entropy(sim_ts2i, targets, label_smoothing=0.1)) / 2
    return float(li), float(ls)


def test_single_process_matches_torch_oracle(rng):
    b, d = 8, 16
    # low-rank-dominated images: a clear spectral gap at PCA dim 4 makes the
    # torch-vs-jax SVD subspaces agree (they differ on degenerate spectra)
    basis = rng.standard_normal((4, d), dtype=np.float32) * 3.0
    img = (rng.standard_normal((b, 4), dtype=np.float32) @ basis
           + 0.01 * rng.standard_normal((b, d), dtype=np.float32))
    tl = rng.standard_normal((b, d), dtype=np.float32)
    ts = rng.standard_normal((b, d), dtype=np.float32)
    scale = np.float32(np.log(1 / 0.07))
    ref_l, ref_s = torch_longclip_loss(torch.from_numpy(img), torch.from_numpy(tl),
                                       torch.from_numpy(ts), torch.tensor(scale))
    got_l, got_s = longclip_contrastive_loss(
        jnp.asarray(img), jnp.asarray(tl), jnp.asarray(ts), jnp.asarray(scale),
        pca_dim=4)
    np.testing.assert_allclose(float(got_l), ref_l, rtol=1e-4)
    np.testing.assert_allclose(float(got_s), ref_s, rtol=1e-2)


def test_sharded_loss_runs_and_grads_flow(rng):
    """8-way shard_map: per-shard PCA + differentiable all_gather
    (replacing torch.distributed.nn.all_gather)."""
    mesh = get_mesh(n_data=8)
    b, d = 16, 8  # 2 per shard
    img = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    tl = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    ts = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    scale = jnp.asarray(np.float32(np.log(1 / 0.07)))

    def total(img, tl, ts):
        def core(i, l, s):
            ll, ls = longclip_contrastive_loss(i, l, s, scale,
                                               axis_name="data", pca_dim=2)
            return jax.lax.pmean(ll + 0.1 * ls, "data")

        return jax.shard_map(core, mesh=mesh,
                             in_specs=(P("data"), P("data"), P("data")),
                             out_specs=P())(img, tl, ts)

    with jax.set_mesh(mesh):
        loss, grads = jax.value_and_grad(total)(img, tl, ts)
    assert np.isfinite(float(loss))
    # gradient must flow through the all_gather into every shard's images
    g = np.asarray(grads)
    assert (np.abs(g).sum(axis=1) > 0).all(), "some rows got zero grad"


def test_longclip_finetune_step_decreases_loss(rng):
    """The full fine-tune engine on the 8-device mesh: jit'ed sharded train
    step, AdamW on the trainable mask (positional_embedding frozen, _res
    trainable — ref: clip/clip.py:250-251), logit-scale clamp at ln(100)."""
    from jax.sharding import NamedSharding

    from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig

    mesh = get_mesh(n_data=8)
    cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_layers=1,
                     vision_width=64, vision_patch_size=16, context_length=16,
                     vocab_size=64, transformer_width=32, transformer_heads=2,
                     transformer_layers=1, long_clip=True)
    model = CLIP(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 16), jnp.int32))["params"]
    # a hot temperature so the clamp is actually exercised
    params["logit_scale"] = jnp.asarray(MAX_LOGIT_SCALE + 0.5)

    state = create_longclip_state(model, params, lr=1e-3, warmup_steps=1,
                                  total_steps=50)
    step = jax.jit(make_longclip_train_step(model, mesh=mesh))

    pe_before = np.asarray(state.params["positional_embedding"])
    res_before = np.asarray(state.params["positional_embedding_res"])

    b = 16
    sh = NamedSharding(mesh, P("data"))
    image = jax.device_put(jnp.asarray(
        rng.standard_normal((b, 32, 32, 3), dtype=np.float32)), sh)
    tl = jax.device_put(jnp.asarray(rng.integers(1, 60, (b, 16)), jnp.int32), sh)
    ts = jax.device_put(jnp.asarray(rng.integers(1, 60, (b, 16)), jnp.int32), sh)

    losses = []
    with jax.set_mesh(mesh):
        for _ in range(6):
            state, aux = step(state, image, tl, ts)
            losses.append(float(aux["loss"]))

    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # frozen vs trainable split
    np.testing.assert_array_equal(
        np.asarray(state.params["positional_embedding"]), pe_before)
    assert np.abs(np.asarray(state.params["positional_embedding_res"])
                  - res_before).max() > 0
    # clamp applied after every step
    assert float(state.params["logit_scale"]) <= MAX_LOGIT_SCALE + 1e-6


def test_schedule_clamps_warmup_to_total_steps():
    """total_steps <= warmup_steps must not raise (optax requires a
    non-empty cosine tail) — regression for the 200-step fine-tune proof,
    which died with 'positive decay_steps, got decay_steps=0'."""
    from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig

    cfg = CLIPConfig(embed_dim=8, image_resolution=32, vision_layers=1,
                     vision_width=64, vision_patch_size=16, context_length=8,
                     vocab_size=32, transformer_width=16, transformer_heads=2,
                     transformer_layers=1, long_clip=True)
    model = CLIP(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    state = create_longclip_state(model, params, lr=1e-3,
                                  warmup_steps=200, total_steps=200)
    # the clamped schedule still warms up and stays finite at every step
    for t in (0, 100, 199, 200):
        assert np.isfinite(float(state.lr_fn(t)))
    assert float(state.lr_fn(0)) < float(state.lr_fn(150))


def test_pca_single_sample_grad_finite(rng):
    """Per-shard batch of 1: pca_reconstruct degrades to identity with a
    well-defined gradient (SVD of the exactly-zero centered matrix has NaN
    grads — regression for the NaN fine-tune at batch == device_count)."""
    from egm_unet_tpu.engine.longclip_train import pca_reconstruct

    x = jnp.asarray(rng.standard_normal((1, 16), dtype=np.float32))
    val = pca_reconstruct(x, 8)
    np.testing.assert_allclose(np.asarray(val), np.asarray(x))
    g = jax.grad(lambda t: jnp.sum(jnp.sin(pca_reconstruct(t, 8))))(x)
    assert np.isfinite(np.asarray(g)).all()
