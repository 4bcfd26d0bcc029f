"""Spatial partitioning (SP): shard the image HEIGHT axis over the mesh.

GSPMD partitions every conv/pool/resize along H and inserts the halo
exchanges itself — the TPU-native answer to "the image doesn't fit one
chip", an axis the single-GPU reference (SURVEY.md §2.12: DP-only NCCL
hooks, never even called) cannot express.  These tests certify the sharding
is mathematically transparent on the 8-device CPU mesh: forward logits,
train-step loss and updated params must match the single-device program.
"""

import numpy as np

import jax
import jax.numpy as jnp

from egm_unet_tpu.data.synthetic import synthetic_tp_batch
from egm_unet_tpu.engine import (
    create_train_state,
    make_train_step,
    warmup_poly_schedule,
)
from egm_unet_tpu.models import create_model
from egm_unet_tpu.parallel import get_mesh_sp, shard_batch_spatial


def _state(model_name="egm_unet", base_c=8, size=64):
    model = create_model(model_name, base_c=base_c)
    sched = warmup_poly_schedule(0.02, 20, 2)
    return create_train_state(model, jax.random.key(0), (1, size, size, 3),
                              sched), model


def test_spatial_forward_equals_single_device():
    """4-way H-sharded EGM-UNet forward == single-device forward."""
    assert jax.device_count() >= 8
    state, model = _state(size=64)
    imgs, _ = synthetic_tp_batch(2, 64)
    x = jnp.asarray(imgs)

    def fwd(v, xx):
        return model.apply(v, xx, train=False)["out"]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ref = np.asarray(jax.jit(fwd)(variables, x))

    mesh = get_mesh_sp(n_data=1, n_spatial=4, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        x_s = shard_batch_spatial(mesh, x)
        out = np.asarray(jax.jit(fwd)(variables, x_s))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spatial_train_step_equals_single_device():
    """2 data x 4 spatial train step == single-device step: same loss,
    same updated params (sync-BN reduces over the sharded H too)."""
    assert jax.device_count() >= 8
    imgs, tgts = synthetic_tp_batch(2, 64)
    imgs, tgts = jnp.asarray(imgs), jnp.asarray(tgts)
    step = make_train_step(num_classes=2)

    state1, _ = _state(size=64)
    state1, aux1 = jax.jit(step)(state1, imgs, tgts)

    mesh = get_mesh_sp(n_data=2, n_spatial=4)
    state2, _ = _state(size=64)
    with jax.set_mesh(mesh):
        imgs_s, tgts_s = shard_batch_spatial(mesh, imgs, tgts)
        state2, aux2 = jax.jit(step)(state2, imgs_s, tgts_s)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_train_cli_mesh_spatial(tmp_path, capsys):
    """`--mesh-data 4 --mesh-spatial 2` drives one synthetic epoch through
    the full train CLI on the 4x2 virtual mesh (train batches H-sharded,
    eval + checkpointing unchanged)."""
    from egm_unet_tpu.cli.train import main

    assert jax.device_count() >= 8
    main(["--synthetic", "--synthetic-n", "8", "--synthetic-val-n", "2",
          "--synthetic-size", "64", "--eval-size", "64",
          "--val-batch-size", "2", "--model", "unet", "--base-c", "8",
          "--batch-size", "4", "--epochs", "1", "--print-freq", "1",
          "--mesh-data", "4", "--mesh-spatial", "2",
          "--save-dir", str(tmp_path / "ckpt"),
          "--results-file", str(tmp_path / "results.txt")])
    out = capsys.readouterr().out
    assert "dice coefficient:" in out
    assert (tmp_path / "results.txt").exists()


def test_mca_pools_spatial_sharding():
    """Regression: max_pool(v)-min_pool(v) co-compiled with avg_pool(v)
    under H-sharding leaked the -inf reduce_window padding into the conv's
    global edge rows (GSPMD halo materialization; fixed by explicit-pad
    max_pool2d, ops/pooling.py)."""
    from egm_unet_tpu.ops.pooling import avg_pool2d, max_pool2d, min_pool2d

    assert jax.device_count() >= 8
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 16)
                    .astype(np.float32))

    def fn(v):
        lr = max_pool2d(v, 3, 1, 1) - min_pool2d(v, 3, 1, 1)
        return lr, avg_pool2d(v, 3, 1, 1)

    ref = jax.jit(fn)(x)
    mesh = get_mesh_sp(n_data=1, n_spatial=4, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        x_s = shard_batch_spatial(mesh, x)
        out = jax.jit(fn)(x_s)
    for o, r in zip(out, ref):
        o, r = np.asarray(o), np.asarray(r)
        assert np.isfinite(o).all()
        np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-6)


def test_spatial_unet_odd_feature_maps():
    """H=96 over 4 shards hits the UNet's odd-size pad path at the deeper
    stages (96 -> 48 -> 24 -> 12 -> 6); GSPMD must stay transparent."""
    assert jax.device_count() >= 8
    state, model = _state(model_name="unet", size=96)
    imgs, _ = synthetic_tp_batch(1, 96)
    x = jnp.asarray(imgs)

    def fwd(v, xx):
        return model.apply(v, xx, train=False)["out"]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ref = np.asarray(jax.jit(fwd)(variables, x))

    mesh = get_mesh_sp(n_data=1, n_spatial=4, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        x_s = shard_batch_spatial(mesh, x)
        out = np.asarray(jax.jit(fwd)(variables, x_s))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
