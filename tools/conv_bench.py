"""Microbenchmark of 3x3-conv implementations at the EGM encoder/decoder
shapes that the round-2/3 profiles flagged as 2-4x off roofline (PERF.md).

Compares, per (B, H, W, C, Co) site:
  - xla      : lax.conv_general_dilated (+bias+relu), what the model ships
  - dots     : nine shifted dot_generals (ops/conv.py conv3x3_dots)
  - pallas   : implicit-GEMM kernel (ops/pallas/conv3x3.py), where supported

Timing uses bench.py's two-point chained-scan methodology (the tunneled TPU
returns from block_until_ready early, so dispatch-loop wall clocks lie).

Run on the TPU:  python tools/conv_bench.py [--batch 128] [--dtype bfloat16]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (name, H, W, C_in, C_out) at batch --batch; encoder/decoder conv sites of
# EGMUNet base_c=32 at 512^2 inference (models/egm_unet.py)
SITES = [
    ("down3/conv2", 64, 64, 256, 256),
    ("down2/conv1", 128, 128, 64, 128),
    ("down2/conv2", 128, 128, 128, 128),
    ("up2/conv2", 128, 128, 128, 128),
    ("down1/conv1", 256, 256, 32, 64),
    ("down1/conv2", 256, 256, 64, 64),
    ("up3/conv2", 256, 256, 64, 64),
    ("inc/conv2", 512, 512, 32, 32),
    ("up4/conv2", 512, 512, 32, 32),
]


def chained(fn, x0, n_iters):
    @jax.jit
    def run(x):
        def step(carry, _):
            out = fn(carry)
            nxt = carry + jnp.mean(out).astype(carry.dtype) * 1e-6
            return nxt, ()

        final, _ = lax.scan(step, x, None, length=n_iters)
        return jnp.sum(final.astype(jnp.float32))

    return run


def time_fetch(fn, *args, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(fn, x, n1=2, n2=10, repeats=3):
    r1, r2 = chained(fn, x, n1), chained(fn, x, n2)
    float(r1(x)); float(r2(x))
    t1 = time_fetch(r1, x, repeats=repeats)
    t2 = time_fetch(r2, x, repeats=repeats)
    return max((t2 - t1) / (n2 - n1), 1e-9)


# fusable DoubleConv pairs of EGMUNet base_c=32 at 512^2 inference:
# (name, H, W, C_in, C_mid, C_out).  Decoder pairs consume the XLA-side
# upsample+concat output (nn/layers.py DoubleConv pallas-pair routing).
PAIR_SITES = [
    ("up1/pair", 64, 64, 512, 256, 128),
    ("up2/pair", 128, 128, 256, 128, 64),
    ("down2/pair*", 128, 128, 64, 128, 128),
    ("down1/pair*", 256, 256, 32, 64, 64),   # *only in no-MCA ablations
    ("up3/pair", 256, 256, 128, 64, 32),
    ("up4/pair", 512, 512, 64, 32, 32),
]


def bench_pairs(args, dt, rng):
    from egm_unet_tpu.ops.conv import conv2d
    from egm_unet_tpu.ops.pallas.conv3x3 import (conv3x3_pair_gemm,
                                                 conv3x3_pair_supported)

    for name, h, w, c, cm, co in PAIR_SITES:
        if args.sites and not any(s in name for s in args.sites.split(",")):
            continue
        shape = (args.batch, h, w, c)
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32), dt)
        w1 = jnp.asarray(
            rng.standard_normal((3, 3, c, cm), dtype=np.float32) * 0.05, dt)
        b1 = jnp.asarray(rng.standard_normal((cm,), np.float32) * 0.05,
                         jnp.float32)
        w2 = jnp.asarray(
            rng.standard_normal((3, 3, cm, co), dtype=np.float32) * 0.05, dt)
        b2 = jnp.asarray(rng.standard_normal((co,), np.float32) * 0.05,
                         jnp.float32)
        flops = 2 * args.batch * h * w * 9 * (c * cm + cm * co)
        row = [f"{name:14s} {h}x{w} {c:3d}->{cm:3d}->{co:3d}"]
        outs = {}

        def xla_fn(xx):
            y = jax.nn.relu(conv2d(xx, w1, padding=1) + b1.astype(xx.dtype))
            return jax.nn.relu(conv2d(y, w2, padding=1) + b2.astype(xx.dtype))

        fns = {"xla": xla_fn}
        if conv3x3_pair_supported(shape, cm, co, dt):
            fns["pair"] = lambda xx: conv3x3_pair_gemm(xx, w1, b1, w2, b2)
        else:
            row.append("pair: n/a")
        for impl, fn in fns.items():
            try:
                outs[impl] = np.asarray(fn(x)[0, 2:4, 2:4, :2], np.float32)
                ms = measure(fn, x) * 1e3
                row.append(f"{impl}: {ms:7.2f}ms ({flops / ms / 1e9:6.1f} TF/s)")
            except Exception as e:
                row.append(f"{impl}: FAIL {type(e).__name__}: {str(e)[:90]}")
        if "xla" in outs and "pair" in outs and not np.allclose(
                outs["pair"], outs["xla"], atol=0.2):
            row.append(f"!PARITY dev="
                       f"{np.max(np.abs(outs['pair'] - outs['xla'])):.3f}")
        print("  ".join(row), flush=True)
        del x, w1, b1, w2, b2, outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--impls", default="xla,pallas")
    p.add_argument("--sites", default=None, help="comma substrings filter")
    p.add_argument("--no-pairs", action="store_true")
    args = p.parse_args()

    from egm_unet_tpu.ops.conv import conv2d, conv3x3_dots
    from egm_unet_tpu.ops.pallas.conv3x3 import (conv3x3_gemm,
                                                 conv3x3_gemm_supported)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    impls = args.impls.split(",")
    print(f"# batch {args.batch} dtype {args.dtype} "
          f"device {jax.devices()[0]}", flush=True)

    for name, h, w, c, co in SITES:
        if args.sites and not any(s in name for s in args.sites.split(",")):
            continue
        shape = (args.batch, h, w, c)
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32), dt)
        wk = jnp.asarray(
            rng.standard_normal((3, 3, c, co), dtype=np.float32) * 0.05, dt)
        b = jnp.asarray(rng.standard_normal((co,), dtype=np.float32) * 0.05,
                        jnp.float32)
        flops = 2 * args.batch * h * w * 9 * c * co
        row = [f"{name:14s} {h}x{w} {c:3d}->{co:3d}"]
        outs = {}
        for impl in impls:
            if impl == "xla":
                fn = lambda xx: jax.nn.relu(
                    conv2d(xx, wk, padding=1) + b.astype(xx.dtype))
            elif impl == "dots":
                fn = lambda xx: conv3x3_dots(xx, wk, b, relu=True)
            elif impl == "pallas":
                if not conv3x3_gemm_supported(shape, co, dt):
                    row.append("pallas: n/a")
                    continue
                fn = lambda xx: conv3x3_gemm(xx, wk, b, relu=True)
            else:
                continue
            try:
                outs[impl] = np.asarray(fn(x)[0, :2, :2, :2], np.float32)
                ms = measure(fn, x) * 1e3
                row.append(f"{impl}: {ms:7.2f}ms ({flops / ms / 1e9:6.1f} TF/s)")
            except Exception as e:
                row.append(f"{impl}: FAIL {type(e).__name__}: {str(e)[:90]}")
        if "xla" in outs:
            for k, v in outs.items():
                if k != "xla" and not np.allclose(v, outs["xla"], atol=0.2):
                    row.append(f"!PARITY {k} dev="
                               f"{np.max(np.abs(v - outs['xla'])):.3f}")
        print("  ".join(row), flush=True)
        del x, wk, b, outs

    if not args.no_pairs:
        bench_pairs(args, dt, rng)


if __name__ == "__main__":
    main()
