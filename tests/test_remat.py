"""Stage rematerialization (EGMUNet.remat): identical forward/grads, lower
peak activation memory.  The reference has no equivalent (torch retains all
activations); remat is the TPU-native enabler for large-batch training
(bs>=64 at 480px OOMs without it, PERF.md round 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egm_unet_tpu.models import create_model


@pytest.fixture(scope="module")
def setup():
    m0 = create_model("egm_unet", base_c=8)
    m1 = create_model("egm_unet", base_c=8, remat=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    v = m0.init(jax.random.key(0), x, train=True)
    return m0, m1, x, v


def test_remat_forward_matches(setup):
    m0, m1, x, v = setup
    o0, _ = m0.apply(v, x, train=True, mutable=["batch_stats"])
    o1, _ = m1.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o0["out"]), np.asarray(o1["out"]),
                               atol=1e-5)


def test_remat_grads_match(setup):
    m0, m1, x, v = setup

    def loss(m):
        def f(p):
            out, _ = m.apply({**v, "params": p}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out["out"] ** 2)
        return jax.grad(f)(v["params"])

    g0, g1 = loss(m0), loss(m1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def test_remat_param_tree_identical(setup):
    m0, m1, x, v = setup
    v1 = m1.init(jax.random.key(0), x, train=True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)


@pytest.fixture(scope="module")
def setup_fine():
    m0 = create_model("egm_unet", base_c=8)
    m2 = create_model("egm_unet", base_c=8, remat="fine")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    v = m0.init(jax.random.key(0), x, train=True)
    return m0, m2, x, v


def test_fine_remat_forward_and_grads_match(setup_fine):
    """remat='fine' (per-conv checkpointing with upsample+concat inside the
    decoder conv boundary — the bs-128 enabler) is graph-equivalent."""
    m0, m2, x, v = setup_fine
    o0, _ = m0.apply(v, x, train=True, mutable=["batch_stats"])
    o2, _ = m2.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o0["out"]), np.asarray(o2["out"]),
                               atol=1e-5)

    def grads(m):
        def f(p):
            out, _ = m.apply({**v, "params": p}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out["out"] ** 2)
        return jax.grad(f)(v["params"])

    for a, b in zip(jax.tree_util.tree_leaves(grads(m0)),
                    jax.tree_util.tree_leaves(grads(m2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def test_fine_remat_param_tree_identical(setup_fine):
    m0, m2, x, v = setup_fine
    v2 = m2.init(jax.random.key(0), x, train=True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)


def test_fine_remat_grfb_branches():
    """remat='fine' also checkpoints each GRFB/EGRFB branch (the bs-128
    decoder-of-the-encoder OOM: ~12 concurrent 225 MB branch temps at
    480px/128, PERF.md round 3) without touching param paths or grads."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    for name in ("egm_unet", "grfb_unet"):
        m0 = create_model(name, base_c=8)
        m2 = create_model(name, base_c=8, remat="fine")
        v = m0.init(jax.random.key(0), x, train=True)
        v2 = m2.init(jax.random.key(0), x, train=True)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2)), name

        def grads(m):
            def f(p):
                out, _ = m.apply({**v, "params": p}, x, train=True,
                                 mutable=["batch_stats"])
                return jnp.sum(out["out"] ** 2)
            return jax.grad(f)(v["params"])

        for a, b in zip(jax.tree_util.tree_leaves(grads(m0)),
                        jax.tree_util.tree_leaves(grads(m2))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=1e-3)
