"""Metric parity vs torch oracles (ref: train_utils/distributed_utils.py)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from egm_unet_tpu import metrics
from tests.test_losses import torch_build_target, torch_multiclass_dice


def torch_confmat_update(mat, a, b, n):
    k = (a >= 0) & (a < n)
    inds = n * a[k].to(torch.int64) + b[k]
    return mat + torch.bincount(inds, minlength=n**2).reshape(n, n)


def test_confusion_matrix(rng):
    n = 2
    t = rng.integers(0, n, size=(5000,)).astype(np.int64)
    t[rng.random(5000) < 0.1] = 255
    p = rng.integers(0, n, size=(5000,)).astype(np.int64)

    ref = torch_confmat_update(torch.zeros(n, n, dtype=torch.int64),
                               torch.from_numpy(t), torch.from_numpy(p), n)
    got = metrics.confmat_update(metrics.confmat_init(n), jnp.asarray(t), jnp.asarray(p))
    np.testing.assert_array_equal(np.asarray(got), ref.numpy())

    h = ref.float()
    acc_global, acc, iu = metrics.confmat_compute(got)
    np.testing.assert_allclose(float(acc_global), float(torch.diag(h).sum() / h.sum()), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), (torch.diag(h) / h.sum(1)).numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(iu),
        (torch.diag(h) / (h.sum(1) + h.sum(0) - torch.diag(h))).numpy(), rtol=1e-5)


def test_confmat_str_format():
    mat = jnp.array([[90, 10], [5, 95]], jnp.int64)
    s = metrics.confmat_str(mat)
    assert "global correct:" in s and "mean IoU:" in s


def test_dice_metric(rng):
    b, h, w, c = 3, 16, 16, 2
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    target = rng.integers(0, c, size=(b, h, w)).astype(np.int64)
    target[rng.random((b, h, w)) < 0.1] = 255

    # torch oracle (ref: distributed_utils.py:128-151)
    tx = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))).contiguous()
    tt = torch.from_numpy(target)
    pred = torch.nn.functional.one_hot(tx.argmax(1), c).permute(0, 3, 1, 2).float()
    dt = torch_build_target(tt, c, 255)
    ref = torch_multiclass_dice(pred[:, 1:], dt[:, 1:], ignore_index=255)

    st = metrics.dice_update(metrics.dice_init(), jnp.asarray(logits), jnp.asarray(target))
    np.testing.assert_allclose(float(st.value), float(ref), rtol=1e-5)


def test_dice_state_is_pytree():
    st = metrics.dice_init()
    leaves = jax.tree_util.tree_leaves(st)
    assert len(leaves) == 2


def test_metrics_jittable(rng):
    n = 2
    upd = jax.jit(metrics.confmat_update)
    t = jnp.asarray(rng.integers(0, n, size=(100,)))
    p = jnp.asarray(rng.integers(0, n, size=(100,)))
    m = upd(metrics.confmat_init(n), t, p)
    assert int(m.sum()) == 100
