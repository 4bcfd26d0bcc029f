"""Checkpoint cadence policy + loader tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egm_unet_tpu.data.loader import BatchLoader
from egm_unet_tpu.data.synthetic import SyntheticTPDataset
from egm_unet_tpu.engine import create_train_state, warmup_poly_schedule
from egm_unet_tpu.models import create_model
from egm_unet_tpu.utils import CheckpointManager


@pytest.fixture(scope="module")
def small_state():
    model = create_model("unet", base_c=8)
    return create_train_state(model, jax.random.key(0), (1, 32, 32, 3),
                              warmup_poly_schedule(0.02, 2, 2))


def test_cadence_policy(tmp_path, small_state):
    """ref train.py:152-164: every `period` epochs, final epoch, and best."""
    mngr = CheckpointManager(str(tmp_path / "ck"), period=3)
    total = 7
    dices = [0.1, 0.5, 0.2, 0.3, 0.6, 0.4, 0.55]
    saved = {}
    for epoch, d in enumerate(dices):
        tags = mngr.maybe_save(epoch, total, small_state, dice=d)
        if tags:
            saved[epoch] = tags
    # best at 0,1,4; periodic at 2,5; final at 6
    assert set(saved) == {0, 1, 2, 4, 5, 6}
    assert "best" in saved[1] and "best" in saved[4]
    assert mngr.best_dice == 0.6
    mngr.close()


def test_restore_roundtrip(tmp_path, small_state):
    mngr = CheckpointManager(str(tmp_path / "ck2"), period=100)
    mngr.maybe_save(0, 1, small_state, dice=0.5, extra={"args": {"lr": 0.02}})
    restored = CheckpointManager(str(tmp_path / "ck2")).restore(small_state)
    assert int(restored["epoch"]) == 0
    for a, b in zip(jax.tree_util.tree_leaves(small_state.params),
                    jax.tree_util.tree_leaves(restored["state"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import json, os

    meta = json.load(open(tmp_path / "ck2" / "meta.json"))
    assert meta["args"]["lr"] == 0.02
    mngr.close()


def test_batch_loader_shapes_and_epoch():
    from egm_unet_tpu.data.transforms import TrainTransform

    ds = SyntheticTPDataset(n=10, transforms=TrainTransform(crop_size=32), h=96, w=96)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # drop_last
    for imgs, tgts in batches:
        assert imgs.shape == (4, 32, 32, 3) and tgts.shape == (4, 32, 32)


def test_batch_loader_collate_pad():
    from egm_unet_tpu.data import collate_pad
    from egm_unet_tpu.data.transforms import EvalTransform

    ds = SyntheticTPDataset(n=2, transforms=EvalTransform(48), h=96, w=128)
    loader = BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                         collate=collate_pad)
    imgs, tgts = next(iter(loader))
    assert imgs.shape[1] % 32 == 0 and imgs.shape[2] % 32 == 0
    # pad region carries the 255 ignore fill
    assert (tgts == 255).any()
