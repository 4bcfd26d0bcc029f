"""Single-model inference CLI (ref: predict.py:18-97): per-image Resize(565)
short side + TP-stats normalize, warm-up forward, timed forward, argmax,
resize mask back to the original size (bilinear, matching cv2 INTER_LINEAR,
ref: predict.py:79), foreground -> 255, save PNG named by the last 4 chars of
the image name, print per-image latency and final FPS.

TPU notes: images are padded to 64-px shape buckets so XLA compiles a handful
of programs instead of one per image; the pad region is cropped off before
the argmax.  Timings are device-synchronized (block_until_ready == the
reference's time_synchronized, ref: predict.py:13-15).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="save_weights", help="checkpoint dir")
    p.add_argument("--data-path", default="./dataset")
    p.add_argument("--txt-name", default="predict.txt")
    p.add_argument("--save-result", default="./predict/test")
    p.add_argument("--model", default="egm_unet")
    p.add_argument("--base-c", default=32, type=int)
    p.add_argument("--num-classes", default=1, type=int)
    p.add_argument("--base-size", default=565, type=int)
    p.add_argument("--amp", action="store_true", help="bf16 compute")
    p.add_argument("--synthetic", action="store_true")
    return p.parse_args(argv)


def bucket_pad(img: np.ndarray, multiple: int = 64):
    h, w = img.shape[:2]
    bh = ((h + multiple - 1) // multiple) * multiple
    bw = ((w + multiple - 1) // multiple) * multiple
    out = np.zeros((bh, bw, img.shape[2]), img.dtype)
    out[:h, :w] = img
    return out


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from egm_unet_tpu.data import DriveDataset, SyntheticTPDataset
    from egm_unet_tpu.data.transforms import EvalTransform
    from egm_unet_tpu.engine import create_train_state, warmup_poly_schedule
    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.ops.resize import resize_bilinear
    from egm_unet_tpu.utils import CheckpointManager

    num_classes = args.num_classes + 1
    dtype = jnp.bfloat16 if args.amp else jnp.float32
    model = create_model(args.model, num_classes=num_classes,
                         base_c=args.base_c, dtype=dtype)
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3),
                               warmup_poly_schedule(0.02, 1, 1))
    if os.path.isdir(args.weights):
        state = CheckpointManager(args.weights).restore(state)["state"]
        print(f"loaded weights from {args.weights}")
    else:
        print("WARNING: no checkpoint dir found; using random init")

    if args.synthetic:
        ds = SyntheticTPDataset(n=4)
    else:
        ds = DriveDataset(args.data_path, None, args.txt_name)
    tf = EvalTransform(args.base_size)

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False)["out"]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    os.makedirs(args.save_result, exist_ok=True)

    total_time, count = 0.0, 0
    for i in range(len(ds)):
        raw, _ = ds[i]
        h, w = raw.shape[:2]
        img, _ = tf(raw, None)
        rh, rw = img.shape[:2]
        x = jnp.asarray(bucket_pad(img)[None], dtype)

        forward(variables, x).block_until_ready()  # warm-up (per bucket shape)
        t0 = time.perf_counter()
        logits = forward(variables, x)
        logits.block_until_ready()
        dt = time.perf_counter() - t0
        total_time += dt
        count += 1
        print(f"inference time: {dt}")

        pred = np.asarray(jnp.argmax(logits[0, :rh, :rw], axis=-1)).astype(np.uint8)
        pred_full = resize_bilinear(jnp.asarray(pred.astype(np.float32))[..., None],
                                    (h, w))[..., 0]
        pred = np.rint(np.asarray(pred_full)).astype(np.uint8)
        pred[pred == 1] = 255

        from PIL import Image

        name = ds.names[i][-4:]
        Image.fromarray(pred).convert("L").save(
            os.path.join(args.save_result, f"{name}.png"))
    if count:
        print("FPS: {}".format(1 / (total_time / count)))


if __name__ == "__main__":
    main()
