"""Per-program XLA compiler options for the TPU serving/bench programs.

Client-side ``XLA_FLAGS`` cannot carry TPU backend flags in a tunneled
(axon/PJRT remote compile) environment: the flag parser runs in the local
process where those flags are not registered (fatal ``Unknown flag`` —
runs/r03_master/xla_flags).  ``jax.jit(..., compiler_options=...)`` rides
the PJRT compile request instead and reaches the compiler that owns the
flags, so it is the one working channel for TPU compiler knobs here.

Measured defaults (PERF.md round 3):
  - ``xla_tpu_scoped_vmem_limit_kib=65536`` lifts the EGM 512px bf16
    headline 474.7 -> 513.5 img/s (+8.2%) by giving the fusion scheduler 4x
    the default scoped-VMEM budget, which deepens the conv+elementwise
    fusions that otherwise round-trip HBM.  48M/80M/98M/128M all measured
    worse; the budget stays at 65536.
  - ``xla_tpu_rwb_fusion=false`` adds +1.3% (512.8 -> 519.5, reproduced
    519.3) — disabling reduce-window/broadcast fusions stops the 2x2
    max-pool windows from being re-fused into (and recomputed by) consumer
    conv fusions.  The queue-8/9 single-knob and stacked sweeps show the
    other accepted knobs (loop-fusion layout opt, licm inflation) add
    nothing beyond run variance on top of these two.

These defaults are **EGM-program-scoped**: they were tuned on the EGM
inference graph and measured HARMFUL elsewhere — CLIPSeg 1232 vs 1357
img/s and Long-CLIP text 4831 vs 5009 prompts/s with the scoped-VMEM
option applied (queue-9 logs), and the unrolled train chains SIGKILL the
remote compile helper with it.  Callers compiling non-EGM programs pass
``defaults=False`` (bench.py ``_jit_plain``).

Override with ``EGM_COMPILER_OPTIONS``:
  - ``EGM_COMPILER_OPTIONS=k=v,k2=v2`` replaces the default set entirely,
  - ``EGM_COMPILER_OPTIONS=none`` disables all options (compiler defaults).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

MEASURED_DEFAULTS: Dict[str, str] = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
    "xla_tpu_rwb_fusion": "false",
}


def tpu_compiler_options(defaults: bool = True) -> Optional[Dict[str, str]]:
    """Options dict for ``jax.jit(..., compiler_options=...)`` or None.

    Returns None on CPU backends (TPU flags would be rejected by the CPU
    client — CI/tests run with the options off).  ``defaults=False`` only
    honors an explicit ``EGM_COMPILER_OPTIONS`` without the measured set.
    """
    spec = os.environ.get("EGM_COMPILER_OPTIONS")
    if spec is not None:
        spec = spec.strip()
        if not spec or spec.lower() == "none":
            return None
        return dict(kv.split("=", 1) for kv in spec.split(",") if kv)
    if not defaults:
        return None
    import jax

    if jax.default_backend() == "cpu":
        return None
    return dict(MEASURED_DEFAULTS)
