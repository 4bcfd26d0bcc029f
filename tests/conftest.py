"""Test config: force an 8-device virtual CPU mesh before jax initializes.

This exercises the multi-device data-parallel paths (SURVEY.md §4) without a
TPU pod, replacing the reference's unused NCCL hooks with something actually
tested.
"""

import os

# Force the virtual 8-device CPU mesh.  NOTE: the env profile registers the
# 'axon' TPU plugin which wins over the JAX_PLATFORMS *env var*; only the
# config update reliably overrides it, and XLA_FLAGS must be set before jax
# initializes for the host-device-count to take effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against fp32 torch; the default matmul/conv precision
# on some backends is bf16-ish. Pin highest for tests only.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
