#!/usr/bin/env python
"""Root-cause probe for the tunneled-backend host-RSS leak (VERDICT r4 #8).

Round 4 observed ~0.9 GB host RSS growth per training epoch (a 145-epoch
run was OOM-killed at 130 GB); a per-epoch ``gc.collect()`` in cli/train.py
stops the growth, which proves the memory is *cyclic garbage* — objects
that only the cycle collector can free, each pinning a host staging buffer.
This probe identifies the cycle:

1. run N dispatch+fetch iterations of a jit'ed step fed with fresh host
   numpy arrays (the train-loop transfer pattern) with automatic GC frozen,
2. ``gc.collect()`` and inspect exactly which object types were collected
   and, for the buffer-pinning ones, who referred to them,
3. report RSS before/after.

Run on the real TPU (the leak does not reproduce on CPU — it lives in the
axon plugin's transfer path).
"""

import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from egm_unet_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 1024.0
    return -1.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--mb-per-transfer", type=float, default=8.0)
    args = p.parse_args()

    n = int(args.mb_per_transfer * (1 << 20) // 4)
    side = int(np.sqrt(n))
    rng = np.random.default_rng(0)

    @jax.jit
    def step(x):
        return jnp.tanh(x * 1.0003).sum()

    x0 = rng.standard_normal((side, side), dtype=np.float32)
    float(step(x0))  # compile

    gc.collect()
    gc.disable()  # freeze automatic collection: leaked cycles accumulate
    r0 = rss_mb()
    print(f"# rss before: {r0:.0f} MB ({args.iters} x "
          f"{args.mb_per_transfer:.0f} MB transfers, gc disabled)", flush=True)

    for i in range(args.iters):
        x = rng.standard_normal((side, side), dtype=np.float32)
        float(step(x))  # host->device transfer + execute + fetch

    r1 = rss_mb()
    print(f"# rss after dispatches: {r1:.0f} MB (delta {r1 - r0:+.0f})",
          flush=True)

    # What does the cycle collector find?
    gc.set_debug(gc.DEBUG_SAVEALL)
    found = gc.collect()
    by_type: dict = {}
    for obj in gc.garbage:
        by_type[type(obj).__module__ + "." + type(obj).__name__] = (
            by_type.get(type(obj).__module__ + "." + type(obj).__name__, 0) + 1)
    print(f"# cycle collector found {found} objects", flush=True)
    for name, cnt in sorted(by_type.items(), key=lambda kv: -kv[1])[:20]:
        print(f"#   {cnt:6d}  {name}", flush=True)

    # referrer chains for the top buffer-ish suspects
    suspects = [o for o in gc.garbage
                if "Array" in type(o).__name__
                or "Buffer" in type(o).__name__
                or type(o).__name__ == "ndarray"][:3]
    for s in suspects:
        refs = [type(r).__module__ + "." + type(r).__name__
                for r in gc.get_referrers(s)
                if r is not gc.garbage][:6]
        print(f"# suspect {type(s).__name__} referrers: {refs}", flush=True)

    gc.set_debug(0)
    gc.garbage.clear()
    gc.collect()
    gc.enable()
    r2 = rss_mb()
    print(f"# rss after collect: {r2:.0f} MB (freed {r1 - r2:+.0f})",
          flush=True)


if __name__ == "__main__":
    main()
