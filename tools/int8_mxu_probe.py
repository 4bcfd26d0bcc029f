#!/usr/bin/env python
"""Isolated int8-vs-bf16 MXU conv probe (VERDICT r4 next #4).

Times s8xs8->s32 convs against bf16 convs at the EGM-UNet hot shapes (the
EGRFB dilated-branch 3x3s and the encoder DoubleConvs, ref model hot spot:
/root/reference/src/EGM-UNet.py:1256-1278) using the bench.py chained-scan
methodology.  Inputs/weights are pre-quantized jit constants, so this
measures PURE conv lowering speed — no quantize/dequantize overhead.  If
int8 cannot beat bf16 here, no amount of fused quantization can make
int8full win, and the lane is retired with this measurement as evidence.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from egm_unet_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def time_fetch(fn, *args, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def chain_conv(x, w, dil, dtype, n_iters, acc):
    pad = ((dil * (w.shape[0] // 2),) * 2,) * 2

    @jax.jit
    def run(xx, ww):
        def step(c, _):
            y = lax.conv_general_dilated(
                c, ww, (1, 1), pad, rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            # renormalize back into the carry dtype/range (serial dependency)
            if acc == jnp.int32:
                c = jnp.clip(y // jnp.maximum(
                    jnp.max(jnp.abs(y)) // 127, 1), -127, 127).astype(dtype)
            else:
                c = (y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-3) * 3).astype(dtype)
            return c, ()

        out, _ = lax.scan(step, xx, None, length=n_iters)
        return jnp.sum(out.astype(jnp.float32))

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n1", type=int, default=2)
    p.add_argument("--n2", type=int, default=10)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()
    rng = np.random.default_rng(0)

    # (B, H, W, Cin, Cout, k, dilation) — EGM hot conv shapes at batch 128
    # scaled to batch 16 to keep probe compiles fast (ratios carry over),
    # plus one big square MXU-bound case as the upper bound.
    cases = [
        ("egrfb_d2_64", (16, 128, 128, 64, 64, 3, 2)),
        ("egrfb_d4_128", (16, 64, 64, 128, 128, 3, 4)),
        ("enc_conv2_64", (16, 256, 256, 64, 64, 3, 1)),
        ("enc_conv2_128", (16, 128, 128, 128, 128, 3, 1)),
        ("dec_conv_256", (16, 64, 64, 256, 256, 3, 1)),
        ("mxu_bound_512", (16, 32, 32, 512, 512, 3, 1)),
    ]
    out = {}
    for name, (b, h, wdt, ci, co, k, dil) in cases:
        res = {}
        for tag, dtype, acc in (("bf16", jnp.bfloat16, jnp.float32),
                                ("int8", jnp.int8, jnp.int32)):
            if dtype == jnp.int8:
                x = jnp.asarray(rng.integers(-127, 128, (b, h, wdt, ci)),
                                jnp.int8)
                w = jnp.asarray(rng.integers(-127, 128, (k, k, ci, co)),
                                jnp.int8)
            else:
                x = jnp.asarray(rng.standard_normal((b, h, wdt, ci)), dtype)
                w = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1,
                                dtype)
            try:
                r1 = chain_conv(x, w, dil, dtype, args.n1, acc)
                r2 = chain_conv(x, w, dil, dtype, args.n2, acc)
                float(r1(x, w)); float(r2(x, w))
                t1 = time_fetch(r1, x, w, repeats=args.repeats)
                t2 = time_fetch(r2, x, w, repeats=args.repeats)
            except Exception as e:
                print(f"# {name}[{tag}] failed: {type(e).__name__}: {e}",
                      flush=True)
                res[tag] = None
                continue
            ms = max((t2 - t1) / (args.n2 - args.n1), 1e-9) * 1e3
            gflop = 2.0 * b * h * wdt * ci * co * k * k / 1e9
            res[tag] = ms
            print(f"# {name}[{tag}]: {ms:.3f} ms/iter "
                  f"({gflop / ms:.1f} TFLOP/s-equiv)", flush=True)
        if res.get("bf16") and res.get("int8"):
            out[name] = {"bf16_ms": round(res["bf16"], 3),
                         "int8_ms": round(res["int8"], 3),
                         "speedup": round(res["bf16"] / res["int8"], 3)}
    print(json.dumps({"metric": "int8_mxu_conv_probe", "cases": out,
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
