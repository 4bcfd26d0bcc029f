"""Loss parity vs a torch oracle built from the documented formulas
(SURVEY.md §2.10; ref: train_utils/dice_coefficient_loss.py,
train_utils/train_and_eval.py:7-19)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from egm_unet_tpu import losses


# ---------------------------------------------------------------- torch oracle
def torch_build_target(target, num_classes=2, ignore_index=-100):
    dice_target = target.clone()
    if ignore_index >= 0:
        ignore_mask = torch.eq(target, ignore_index)
        dice_target[ignore_mask] = 0
        dice_target = F.one_hot(dice_target, num_classes).float()
        dice_target[ignore_mask] = ignore_index
    else:
        dice_target = F.one_hot(dice_target, num_classes).float()
    return dice_target.permute(0, 3, 1, 2)


def torch_dice_coeff(x, target, ignore_index=-100, epsilon=1e-6):
    d = 0.0
    for i in range(x.shape[0]):
        x_i, t_i = x[i].reshape(-1), target[i].reshape(-1)
        if ignore_index >= 0:
            roi = torch.ne(t_i, ignore_index)
            x_i, t_i = x_i[roi], t_i[roi]
        inter = torch.dot(x_i, t_i)
        sets_sum = torch.sum(x_i) + torch.sum(t_i)
        if sets_sum == 0:
            sets_sum = 2 * inter
        d += (2 * inter + epsilon) / (sets_sum + epsilon)
    return d / x.shape[0]


def torch_multiclass_dice(x, target, ignore_index=-100):
    dice = 0.0
    for ch in range(x.shape[1]):
        dice += torch_dice_coeff(x[:, ch], target[:, ch], ignore_index)
    return dice / x.shape[1]


def torch_dice_loss(x, target, ignore_index=-100):
    return 1 - torch_multiclass_dice(F.softmax(x, dim=1), target, ignore_index)


def torch_laplace_loss(x):
    x = torch.narrow(x, 1, 0, 1)
    k = torch.tensor([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=torch.float32)[None, None]
    return torch.mean(torch.abs(F.conv2d(x, k, padding=1)))


def torch_lap_loss(x, target):
    x = torch.narrow(x, 1, 0, 1)
    target = torch.narrow(target.float(), 0, 0, 1)
    k = torch.tensor([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], dtype=torch.float32)[None, None]
    return torch.mean(torch.abs(F.conv2d(x, k, padding=1) - F.conv2d(target, k, padding=1)))


def torch_sobel_loss(y_true, y_pred):
    y_true = torch.narrow(y_true, 1, 0, 1)
    y_pred = torch.narrow(y_pred.float(), 0, 0, 1)
    sx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=torch.float32)[None, None]
    sy = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=torch.float32)[None, None]
    return (
        torch.abs(F.conv2d(y_true, sx, padding=1) - F.conv2d(y_pred, sx, padding=1))
        + torch.abs(F.conv2d(y_true, sy, padding=1) - F.conv2d(y_pred, sy, padding=1))
    ).mean()


def torch_criterion(x, target, weight, num_classes=2, ignore_index=255):
    loss = F.cross_entropy(x, target, ignore_index=ignore_index, weight=weight)
    dt = torch_build_target(target, num_classes, ignore_index)
    return (
        loss
        + torch_dice_loss(x, dt, ignore_index)
        + torch_laplace_loss(x)
        + torch_lap_loss(x, target)
        + torch_sobel_loss(x, target)
    )


# ---------------------------------------------------------------------- data
def make_batch(rng, b=3, h=17, w=19, c=2, with_ignore=True):
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    target = rng.integers(0, c, size=(b, h, w)).astype(np.int64)
    if with_ignore:
        mask = rng.random((b, h, w)) < 0.15
        target[mask] = 255
    return logits, target


def as_torch(logits, target):
    return (
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))).contiguous(),
        torch.from_numpy(target),
    )


# --------------------------------------------------------------------- tests
def test_cross_entropy_weighted_ignore(rng):
    logits, target = make_batch(rng)
    tx, tt = as_torch(logits, target)
    ref = F.cross_entropy(tx, tt, weight=torch.tensor([1.0, 2.0]), ignore_index=255)
    got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                               jnp.array([1.0, 2.0]), 255)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_build_target(rng):
    _, target = make_batch(rng)
    ref = torch_build_target(torch.from_numpy(target), 2, 255).numpy()
    got = np.transpose(np.asarray(losses.build_target(jnp.asarray(target), 2, 255)), (0, 3, 1, 2))
    np.testing.assert_array_equal(got, ref)


def test_dice_loss(rng):
    logits, target = make_batch(rng)
    tx, tt = as_torch(logits, target)
    ref = torch_dice_loss(tx, torch_build_target(tt, 2, 255), 255)
    dt = losses.build_target(jnp.asarray(target), 2, 255)
    got = losses.dice_loss(jnp.asarray(logits), dt, multiclass=True, ignore_index=255)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_dice_sets_sum_zero_fallback():
    # all-background prediction & target in one channel -> sets_sum == 0 path
    x = jnp.zeros((1, 4, 4))
    t = jnp.zeros((1, 4, 4))
    d = losses.dice_coeff(x, t, ignore_index=-100)
    np.testing.assert_allclose(float(d), 1.0, rtol=1e-6)  # (0+eps)/(0+eps)


def test_edge_losses(rng):
    logits, target = make_batch(rng)
    tx, tt = as_torch(logits, target)
    jl, jt = jnp.asarray(logits), jnp.asarray(target)
    # rtol 1e-3: fp32 conv accumulation order differs between XLA and torch
    # on 255-magnitude ignore-filled targets.
    np.testing.assert_allclose(
        float(losses.laplace_loss(jl)), float(torch_laplace_loss(tx)), rtol=1e-3)
    np.testing.assert_allclose(
        float(losses.lap_loss(jl, jt)), float(torch_lap_loss(tx, tt)), rtol=1e-3)
    np.testing.assert_allclose(
        float(losses.sobel_loss(jl, jt)), float(torch_sobel_loss(tx, tt)), rtol=1e-3)


def test_total_criterion(rng):
    logits, target = make_batch(rng, b=4, h=24, w=24)
    tx, tt = as_torch(logits, target)
    ref = torch_criterion(tx, tt, torch.tensor([1.0, 2.0]))
    got = losses.criterion({"out": jnp.asarray(logits)}, jnp.asarray(target),
                           losses.default_loss_weight(2), num_classes=2)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-3)


def test_aux_head_weighting(rng):
    logits, target = make_batch(rng)
    aux = logits * 0.5
    j = {"out": jnp.asarray(logits), "aux": jnp.asarray(aux)}
    got = losses.criterion(j, jnp.asarray(target), None, num_classes=2)
    lo = losses.criterion({"out": jnp.asarray(logits)}, jnp.asarray(target), None, 2)
    la = losses.criterion({"out": jnp.asarray(aux)}, jnp.asarray(target), None, 2)
    np.testing.assert_allclose(float(got), float(lo) + 0.5 * float(la), rtol=1e-6)
