"""Fail-fast Mosaic compile probe for the implicit-GEMM conv kernels.

The mca/upconv kernels needed lane/sublane-alignment fixes the interpreter
never surfaced (see the round-2 'compile on real TPU' commit); this probes
conv3x3_gemm / conv3x3_pair_gemm compiled at one tiny shape per channel
class (C 32/64/128) BEFORE the queue spends a chip-hour benchmarking them.

Run on the TPU:  python tools/conv_compile_probe.py
"""

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from egm_unet_tpu.ops.conv import conv2d
from egm_unet_tpu.ops.pallas.conv3x3 import conv3x3_gemm, conv3x3_pair_gemm


def probe(name, fn, ref_fn, tol=2e-2):
    # tol is RELATIVE to the output magnitude: the kernels carry bf16
    # operands into K-deep GEMMs (K up to 9*512), so the absolute deviation
    # vs the f32 reference scales with |out| (f32-interpret parity is exact
    # to 1e-5 — tests/test_conv3x3.py); what this probe is for is Mosaic
    # lowering bugs, which produce O(|out|) garbage, not sub-percent noise.
    try:
        out = np.asarray(fn(), np.float32)
        ref = np.asarray(ref_fn(), np.float32)
        dev = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-6))
        ok = dev < tol
        print(f"[probe] {name}: {'ok' if ok else 'PARITY-FAIL'} "
              f"rel|d|={dev:.3e}", flush=True)
        return ok
    except Exception:
        print(f"[probe] {name}: COMPILE/RUN FAIL", flush=True)
        traceback.print_exc()
        return False


def main():
    print(f"[probe] backend {jax.default_backend()} {jax.devices()}",
          flush=True)
    rng = np.random.default_rng(0)
    all_ok = True
    for c, co in ((32, 32), (64, 64), (128, 128), (64, 128)):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
        all_ok &= probe(
            f"conv3x3_gemm c{c}->co{co}",
            lambda x=x, w=w, b=b: conv3x3_gemm(x, w, b, relu=True),
            lambda x=x, w=w, b=b: jax.nn.relu(
                conv2d(x.astype(jnp.float32), w.astype(jnp.float32),
                       padding=1) + b))
    for c, cm, co in ((32, 64, 64), (64, 128, 128), (512, 256, 128),
                      (64, 32, 32)):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, c, cm)) * 0.1,
                         jnp.bfloat16)
        b1 = jnp.asarray(rng.standard_normal((cm,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, cm, co)) * 0.1,
                         jnp.bfloat16)
        b2 = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)

        def ref(x=x, w1=w1, b1=b1, w2=w2, b2=b2):
            y = jax.nn.relu(conv2d(x.astype(jnp.float32),
                                   w1.astype(jnp.float32), padding=1) + b1)
            return jax.nn.relu(conv2d(y, w2.astype(jnp.float32),
                                      padding=1) + b2)

        all_ok &= probe(
            f"conv3x3_pair c{c}->{cm}->{co}",
            lambda x=x, w1=w1, b1=b1, w2=w2, b2=b2: conv3x3_pair_gemm(
                x, w1, b1, w2, b2), ref)
    print(f"[probe] ALL {'OK' if all_ok else 'FAILED'}", flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
