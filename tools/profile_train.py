#!/usr/bin/env python
"""Device-trace profile of the full train step (loss + backward + SGD) on
the real TPU.  Usage: python tools/profile_train.py [--batch 64] [--size 480]
[--remat].  Parses the chrome trace like tools/profile_egm.py."""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_traced(batch, size, remat, logdir):
    from egm_unet_tpu.engine import (create_train_state, make_train_step,
                                     warmup_poly_schedule)
    from egm_unet_tpu.models import create_model

    model = create_model("egm_unet", base_c=32, num_classes=2,
                         dtype=jnp.bfloat16, remat=remat)
    sched = warmup_poly_schedule(0.02, num_step=100, epochs=200)
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3), sched)
    step = jax.jit(make_train_step(num_classes=2))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, size, size, 3),
                                             dtype=np.float32), jnp.bfloat16)
    targets = jnp.asarray(rng.integers(0, 2, (batch, size, size)), jnp.int32)
    state, aux = step(state, images, targets)  # compile + warm
    float(aux["loss"])
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        state, aux = step(state, images, targets)
        float(aux["loss"])
    jax.profiler.stop_trace()


def report(logdir, topk=25):
    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    ev = json.load(gzip.open(path))["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"]["name"]
    bycat = collections.Counter()
    byop = collections.Counter()
    total = 0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            if not ("TPU" in names.get(e.get("pid"), "")):
                continue
            n = e["name"]
            a = e.get("args") or {}
            if n.startswith("jit_"):
                continue
            total += e["dur"]
            bycat[a.get("hlo_category", "?")] += e["dur"]
            top = a.get("tf_op", n)
            m = re.search(r"(transpose\(fwd\)|fwd)/EGMUNet/([a-z_0-9]+)", top)
            key = (("bwd:" if "transpose" in top else "fwd:") + m.group(2)) if m \
                else top.split("/")[-1][:48]
            byop[key] += e["dur"]
    print(f"device op total: {total/3e3:.1f} ms/step")
    print("\n== by hlo_category (ms/step):")
    for c, d in bycat.most_common(12):
        print(f"{d/3e3:9.2f}  {c}")
    print(f"\n== by fwd/bwd module (ms/step, top {topk}):")
    for k, d in byop.most_common(topk):
        print(f"{d/3e3:9.2f}  {k}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=480)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--logdir", default="/tmp/jax_trace_train")
    args = p.parse_args()
    run_traced(args.batch, args.size, args.remat, args.logdir)
    report(args.logdir)
