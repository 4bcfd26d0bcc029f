"""Unit tests for the per-program XLA compiler-options layer
(egm_unet_tpu/utils/compile_opts.py).

The measured TPU defaults are EGM-program-scoped (PERF.md round 3: they
tax the CLIPSeg/text programs and SIGKILL the remote compile helper on
unrolled train chains), so the contract under test is:
  - explicit ``EGM_COMPILER_OPTIONS=k=v,...`` always wins (both scopes),
  - ``EGM_COMPILER_OPTIONS=none``/empty disables everything,
  - ``defaults=False`` (non-EGM programs) returns None without env,
  - CPU backends get None even with defaults=True (TPU flags would be
    rejected client-side; CI runs with options off).
"""

import os

import pytest

from egm_unet_tpu.utils.compile_opts import (MEASURED_DEFAULTS,
                                             tpu_compiler_options)


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("EGM_COMPILER_OPTIONS", raising=False)


def test_explicit_spec_parses_and_wins(monkeypatch, clean_env):
    monkeypatch.setenv("EGM_COMPILER_OPTIONS",
                       "xla_tpu_scoped_vmem_limit_kib=131072,xla_foo=bar")
    expect = {"xla_tpu_scoped_vmem_limit_kib": "131072", "xla_foo": "bar"}
    assert tpu_compiler_options() == expect
    # explicit env applies to non-EGM programs too (caller opted in)
    assert tpu_compiler_options(defaults=False) == expect


@pytest.mark.parametrize("spec", ["none", "NONE", "", "  "])
def test_none_and_empty_disable(monkeypatch, clean_env, spec):
    monkeypatch.setenv("EGM_COMPILER_OPTIONS", spec)
    assert tpu_compiler_options() is None
    assert tpu_compiler_options(defaults=False) is None


def test_value_with_colon_survives_split(monkeypatch, clean_env):
    # option values may contain ':' (e.g. memory_bound_loop_optimizer
    # sub-options) and '=' must split only once
    monkeypatch.setenv("EGM_COMPILER_OPTIONS", "k=enabled:true,j=a=b")
    assert tpu_compiler_options() == {"k": "enabled:true", "j": "a=b"}


def test_non_egm_programs_get_no_defaults(clean_env):
    assert tpu_compiler_options(defaults=False) is None


def test_cpu_backend_gets_none(clean_env):
    # conftest forces the CPU platform for the whole suite, so the
    # defaults=True path must return None here (TPU flags would be
    # rejected by the CPU client)
    import jax

    assert jax.default_backend() == "cpu"
    assert tpu_compiler_options() is None


def test_measured_defaults_shape():
    # the shipping set documented in PERF.md round 3
    assert MEASURED_DEFAULTS == {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_rwb_fusion": "false",
    }
