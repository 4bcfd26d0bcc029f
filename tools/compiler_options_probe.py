#!/usr/bin/env python
"""Probe which XLA compiler options the remote (axon/PJRT) TPU compiler
accepts via ``jax.jit(..., compiler_options=...)``.

Client-side ``XLA_FLAGS`` is a dead end in this environment: the flag
parser runs in the local process where TPU backend flags are not registered
(fatal ``Unknown flag``, see runs/r03_master/xla_flags/*.log).  Per-program
compiler options ride the PJRT compile request instead, so they reach the
compiler that actually owns the flags.

Each candidate compiles a small conv+relu chain (shape-representative of
the EGM graph: 3x3 conv, NHWC, bf16) and reports accept/reject.  Cheap by
design — acceptance here gates a full bench.py run via
``EGM_COMPILER_OPTIONS`` (same key=value syntax).
"""
import sys

import numpy as np

CANDIDATES = [
    {},  # control
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    {"xla_enable_async_all_gather": "false"},
    # round-3 second wave: finer vmem sweep + fusion/layout knobs that
    # target the profile's known costs (layout flips, window-tap reads)
    {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    {"xla_tpu_scoped_vmem_limit_kib": "81920"},
    {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    {"xla_tpu_rwb_fusion": "false"},
    {"xla_tpu_enable_dot_strength_reduction": "false"},
    {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    {"xla_tpu_dot_dot_fusion": "true"},
    {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    {"xla_tpu_nested_dot_fusion": "true"},
    {"xla_tpu_enable_vmem_to_vmem_dmas": "true"},
    {"xla_tpu_vector_load_fusion_level": "2"},
    {"xla_tpu_async_copy_bandwidth_scaling_factor": "1.5"},
    {"xla_tpu_memory_limit_slack_factor": "0.95"},
    {"xla_tpu_prefer_async_allocations": "true"},
    # round-3 third wave: VMEM scavenging, copy/output fusion, MSA/loop
    # optimizer knobs aimed at the bandwidth-bound stages
    {"xla_tpu_scavenge_vmem_for_fusions": "true"},
    {"xla_tpu_enable_copy_fusion": "true"},
    {"xla_tpu_enable_experimental_exhaustive_output_fusion": "true"},
    {"xla_tpu_aggressive_opt_barrier_removal": "true"},
    {"xla_tpu_reduce_loop_fusion_dup_with_unfusable_user": "true"},
    {"xla_tpu_allocate_scoped_vmem_at_same_offset": "false"},
    {"xla_tpu_copy_with_multiple_strategies": "true"},
    {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"},
    {"xla_tpu_use_repeated_instance_for_preferred_prefetch_time": "true"},
    {"xla_tpu_sliced_prefetch": "true"},
    {"xla_memory_scheduler": "list"},
    {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"},
    {"xla_tpu_licm_size_inflation_ratio": "4.0"},
]


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 32), np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32), np.float32),
                    jnp.bfloat16)

    def f(x, w):
        for _ in range(3):
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.sum(x.astype(jnp.float32))

    any_accepted = False
    for opts in CANDIDATES:
        name = ",".join(f"{k}={v}" for k, v in opts.items()) or "<control>"
        try:
            out = float(jax.jit(f, compiler_options=opts or None)(x, w))
            print(f"ACCEPT {name}  (out={out:.3f})", flush=True)
            any_accepted = any_accepted or bool(opts)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"REJECT {name}  {type(e).__name__}: {msg}", flush=True)
    return 0 if any_accepted else 1


if __name__ == "__main__":
    sys.exit(main())
