#!/usr/bin/env python
"""Device-trace profile of the EGM-UNet inference hot path on the real TPU.

Dumps a per-op-category time breakdown parsed from the jax.profiler trace
(the .xplane.pb protobuf), because TensorBoard isn't available here.
Usage: python tools/profile_egm.py [--batch 128] [--no-fold-bn]
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_traced(batch, size, fold, logdir):
    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.models.fold_bn import fold_bn_variables

    dtype = jnp.bfloat16
    model = create_model("egm_unet", base_c=32, num_classes=2, dtype=dtype,
                         fold_bn=fold)
    init_model = create_model("egm_unet", base_c=32, num_classes=2, dtype=dtype)
    variables = init_model.init(jax.random.key(0), jnp.zeros((1, size, size, 3), dtype),
                                train=True)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    if fold:
        variables = fold_bn_variables(variables)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def fwd(v, x):
        return jnp.sum(model.apply(v, x, train=False)["out"])

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, size, size, 3), dtype=np.float32), dtype)
    float(fwd(variables, x))  # compile + warm
    float(fwd(variables, x))
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        float(fwd(variables, x))
    jax.profiler.stop_trace()


def parse_xplane(logdir):
    """Minimal xplane.pb reader: extract (event name, duration) pairs from the
    device plane using the tensorflow profiler protos if available, else a
    crude varint scan. Returns {op_name: total_ps}."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    path = max(paths, key=os.path.getmtime)
    try:
        from tensorflow.python.profiler.protobuf import xplane_pb2  # type: ignore
    except Exception:
        xplane_pb2 = None
    if xplane_pb2 is None:
        try:
            from tsl.profiler.protobuf import xplane_pb2  # type: ignore
        except Exception:
            raise SystemExit("no xplane proto available; inspect trace manually")
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    out = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                out[name] = out.get(name, 0) + ev.duration_ps
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--no-fold-bn", action="store_true")
    p.add_argument("--logdir", default="/tmp/jax_trace_egm")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()

    os.system(f"rm -rf {args.logdir}")
    run_traced(args.batch, args.size, not args.no_fold_bn, args.logdir)
    ops = parse_xplane(args.logdir)

    # bucket by category
    cats = {}
    for name, ps in ops.items():
        base = re.sub(r"\.\d+$", "", name.split("%")[-1].split(" ")[0])
        key = re.sub(r"\d+$", "", base)
        cats[key] = cats.get(key, 0) + ps
    total = sum(cats.values())
    print(f"total device time: {total / 1e12 * 1e3:.1f} ms (3 iters)")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v / 1e12 * 1e3 / 3:9.2f} ms/iter  {v / total * 100:5.1f}%  {k}")


if __name__ == "__main__":
    main()
