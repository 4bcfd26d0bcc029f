"""Train-engine tests: schedule parity, smoke training (loss decreases),
data-parallel equivalence on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egm_unet_tpu.data.synthetic import synthetic_tp_batch
from egm_unet_tpu.engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
    warmup_poly_schedule,
)
from egm_unet_tpu.models import create_model
from egm_unet_tpu import metrics as M
from egm_unet_tpu.parallel import get_mesh, shard_batch


def test_schedule_matches_torch_lambda():
    """ref: train_utils/train_and_eval.py:88-98."""
    num_step, epochs, lr = 7, 5, 0.02

    def torch_f(x):
        warmup_epochs, warmup_factor = 1, 1e-3
        if x <= warmup_epochs * num_step:
            alpha = float(x) / (warmup_epochs * num_step)
            return warmup_factor * (1 - alpha) + alpha
        return (1 - (x - warmup_epochs * num_step) / ((epochs - warmup_epochs) * num_step)) ** 0.9

    sched = warmup_poly_schedule(lr, num_step, epochs)
    for step in range(num_step * epochs):
        np.testing.assert_allclose(float(sched(step)), lr * torch_f(step), rtol=1e-5,
                                   err_msg=f"step {step}")


def make_state(model_name="unet", base_c=8, size=64, steps=20):
    model = create_model(model_name, base_c=base_c)
    sched = warmup_poly_schedule(0.02, steps, 2)
    return create_train_state(model, jax.random.key(0), (1, size, size, 3), sched)


def test_train_smoke_loss_decreases():
    """A few steps on synthetic data must reduce the loss (SURVEY.md §4)."""
    state = make_state()
    step_fn = jax.jit(make_train_step(num_classes=2))
    imgs, tgts = synthetic_tp_batch(4, 64)
    losses = []
    for i in range(8):
        state, aux = step_fn(state, jnp.asarray(imgs), jnp.asarray(tgts))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses


def test_eval_step_metrics():
    state = make_state()
    eval_fn = jax.jit(make_eval_step(num_classes=2))
    imgs, tgts = synthetic_tp_batch(2, 64)
    confmat, dice = eval_fn(state, jnp.asarray(imgs), jnp.asarray(tgts),
                            M.confmat_init(2), M.dice_init())
    assert int(np.asarray(confmat).sum()) == 2 * 64 * 64
    assert 0.0 <= float(dice.value) <= 1.0


def test_data_parallel_equals_single_device():
    """The jit'ed step over an 8-device 'data' mesh must produce the same
    params as the single-device step (GSPMD DP correctness)."""
    assert jax.device_count() >= 8, "conftest should force 8 cpu devices"
    imgs, tgts = synthetic_tp_batch(8, 32)
    imgs, tgts = jnp.asarray(imgs), jnp.asarray(tgts)

    step = make_train_step(num_classes=2)

    state1 = make_state(size=32)
    state1, aux1 = jax.jit(step)(state1, imgs, tgts)

    mesh = get_mesh(n_data=8)
    state2 = make_state(size=32)
    with jax.set_mesh(mesh):
        imgs_s, tgts_s = shard_batch(mesh, imgs, tgts)
        state2, aux2 = jax.jit(step)(state2, imgs_s, tgts_s)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sgd_matches_torch(rng):
    """optax chain == torch.optim.SGD(momentum=0.9, weight_decay=1e-4)."""
    import torch

    from egm_unet_tpu.engine.state import sgd_torch

    w0 = rng.standard_normal((5, 3), dtype=np.float32)
    tparam = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tparam], lr=0.02, momentum=0.9, weight_decay=1e-4)

    tx = sgd_torch(lambda s: 0.02)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for i in range(5):
        g = rng.standard_normal((5, 3), dtype=np.float32)
        opt.zero_grad()
        tparam.grad = torch.from_numpy(g.copy())
        opt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]), tparam.detach().numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=f"step {i}")


def test_bf16_train_step():
    """Regression: bf16 training crashed with a conv-VJP dtype mismatch when
    convs passed preferred_element_type=f32 (jax 0.9)."""
    import jax.numpy as jnp

    model = create_model("egm_unet", base_c=8, dtype=jnp.bfloat16)
    sched = warmup_poly_schedule(0.02, 4, 2)
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3), sched)
    step_fn = jax.jit(make_train_step(num_classes=2))
    imgs, tgts = synthetic_tp_batch(2, 64)
    state, aux = step_fn(state, jnp.asarray(imgs, jnp.bfloat16), jnp.asarray(tgts))
    assert np.isfinite(float(aux["loss"]))


def test_multistep_equals_step_loop():
    """K scanned steps (make_train_multistep) == K sequential single steps:
    same params, BN stats, opt state, and per-step losses (round-3
    dispatch-amortization feature for tunneled TPUs)."""
    from egm_unet_tpu.engine import make_train_multistep

    model = create_model("unet", base_c=8)
    sched = warmup_poly_schedule(0.01, 4, 2)
    s1 = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), sched)
    s2 = jax.tree_util.tree_map(lambda x: x, s1)

    k, b = 3, 2
    imgs, tgts = synthetic_tp_batch(k * b, size=32, seed=7)
    imgs = np.asarray(imgs).reshape(k, b, 32, 32, 3)
    tgts = np.asarray(tgts).reshape(k, b, 32, 32)

    step = jax.jit(make_train_step())
    losses1 = []
    for i in range(k):
        s1, aux = step(s1, jnp.asarray(imgs[i]), jnp.asarray(tgts[i]))
        losses1.append(float(aux["loss"]))

    multi = jax.jit(make_train_multistep())
    s2, aux2 = multi(s2, jnp.asarray(imgs), jnp.asarray(tgts))

    np.testing.assert_allclose(np.asarray(aux2["loss"]), losses1,
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                     jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    assert int(s1.step) == int(s2.step) == k


def test_wire_uint8_normalize_on_device_equivalent():
    """make_train_step(normalize=(mean,std)) on raw uint8 crops follows the
    exact same trajectory as host-normalized f32 input (the /255, -mean,
    /std run in f32 either way — round-3 H2D-bandwidth feature)."""
    from egm_unet_tpu.data.transforms import TP_MEAN, TP_STD, normalize
    from egm_unet_tpu.engine import make_train_multistep

    model = create_model("unet", base_c=8)
    sched = warmup_poly_schedule(0.01, 2, 1)
    s1 = create_train_state(model, jax.random.key(0), (1, 32, 32, 3), sched)
    s2 = jax.tree_util.tree_map(lambda x: x, s1)

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (2, 2, 32, 32, 3)).astype(np.uint8)
    tgts = rng.integers(0, 2, (2, 2, 32, 32)).astype(np.int32)
    host_norm = normalize(raw, TP_MEAN, TP_STD).astype(np.float32)

    s1, a1 = jax.jit(make_train_multistep())(s1, jnp.asarray(host_norm),
                                             jnp.asarray(tgts))
    s2, a2 = jax.jit(make_train_multistep(
        normalize=(TP_MEAN, TP_STD), input_dtype=jnp.float32))(
        s2, jnp.asarray(raw), jnp.asarray(tgts))

    np.testing.assert_allclose(np.asarray(a2["loss"]), np.asarray(a1["loss"]),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
