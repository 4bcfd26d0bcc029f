"""Fusion predict CLI (ref: predict_CLIPseg.py:284-550): same two-stage
pipeline as eval_clipseg but alpha is *loaded* from best_alpha.txt
(default 0.5 when absent) and masks are rendered for predict.txt at original
image size (NEAREST), color map {0: 0, 1: 255}.

The default prompt pair is the long descriptive tactile-paving prompt — the
Long-CLIP 248-token payload (ref: predict_CLIPseg.py:417)."""

from __future__ import annotations

import argparse
import os

import numpy as np

# A long descriptive foreground prompt exercising the 248-token context
# (the reference uses a similar long free-text description,
# ref: predict_CLIPseg.py:417).
DEFAULT_PROMPTS = [
    "background",
    "Tactile paving: a strip of textured guide bricks on the sidewalk, "
    "usually bright yellow with raised parallel bars or round dots, laid in "
    "a continuous path to guide visually impaired pedestrians; it contrasts "
    "with the surrounding pavement in both color and texture and often runs "
    "along the center of the walkway or bends at intersections.",
]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="./dataset")
    p.add_argument("--txt-name", default="predict.txt")
    p.add_argument("--unet-weights", default="save_weights")
    p.add_argument("--clipseg-weights", default="weights/rd64-uni.pth")
    p.add_argument("--longclip-weights", default="weights/longclip-B.pt")
    p.add_argument("--model", default="grfb_unet")
    p.add_argument("--base-c", default=32, type=int)
    p.add_argument("--prompts", nargs="+", default=DEFAULT_PROMPTS)
    p.add_argument("--clip-size", default=352, type=int)
    p.add_argument("--base-size", default=565, type=int)
    p.add_argument("--alpha-file", default="best_alpha.txt")
    p.add_argument("--save-result", default="./predict/fusion")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--clip-batch", default=32, type=int)
    p.add_argument("--unet-batch", default=16, type=int)
    p.add_argument("--tiny-clip", action="store_true",
                   help="small random CLIP tower (CI smoke; no checkpoints)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from egm_unet_tpu.cli.eval_clipseg import build_clipseg, run_in_chunks
    from egm_unet_tpu.cli.predict import bucket_pad
    from egm_unet_tpu.data import DriveDataset, SyntheticTPDataset
    from egm_unet_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                              EvalTransform, normalize)
    from egm_unet_tpu.engine import create_train_state, warmup_poly_schedule
    from egm_unet_tpu.engine.fusion import fuse_logits, load_alpha
    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.models.clip.tokenizer import tokenize
    from egm_unet_tpu.ops.resize import resize_bilinear, resize_nearest
    from egm_unet_tpu.utils import CheckpointManager

    alpha = load_alpha(args.alpha_file)
    print(f"alpha = {alpha} (from {args.alpha_file})")

    unet = create_model(args.model, num_classes=2, base_c=args.base_c)
    state = create_train_state(unet, jax.random.key(0), (1, 64, 64, 3),
                               warmup_poly_schedule(0.02, 1, 1))
    if os.path.isdir(args.unet_weights):
        state = CheckpointManager(args.unet_weights).restore(state)["state"]
    # variables as jit ARGUMENTS (not closure constants): baked weights
    # overflow the axon remote-compile request (HTTP 413) on the ViT tower
    unet_vars = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats})

    @jax.jit
    def _unet_apply(v, x):
        return unet.apply(v, x, train=False)["out"]

    def unet_forward(x):
        return _unet_apply(unet_vars, x)

    clipseg, clipseg_vars = build_clipseg(args)
    clipseg_vars = jax.device_put(clipseg_vars)

    @jax.jit
    def _clipseg_apply(v, x, cond):
        (logits,) = clipseg.apply(v, x, cond)
        return logits

    def clipseg_forward(x, cond):
        return _clipseg_apply(clipseg_vars, x, cond)

    try:
        if args.tiny_clip:
            raise FileNotFoundError  # random tower: tokens are meaningless
        tokens = jnp.asarray(tokenize(args.prompts, truncate=True))
        cond = jax.jit(lambda v, t: clipseg.apply(
            v, t, method=clipseg.compute_conditional))(clipseg_vars, tokens)
    except FileNotFoundError:
        print("WARNING: BPE vocab missing; using random prompt embeddings")
        cond = jax.random.normal(jax.random.key(1),
                                 (len(args.prompts), clipseg.clip_cfg.embed_dim))

    ds = (SyntheticTPDataset(4) if args.synthetic
          else DriveDataset(args.data_path, None, args.txt_name))
    tf = EvalTransform(args.base_size)
    os.makedirs(args.save_result, exist_ok=True)

    # host preprocessing, then batched device programs (same O(buckets)
    # dispatch structure as eval_clipseg; ref per-image loop:
    # predict_CLIPseg.py:440-510)
    n = len(ds)
    n_prompts = len(args.prompts)
    raw_hw, img565s, img352s = [], [], []
    for i in range(n):
        raw, _ = ds[i]
        raw_hw.append(raw.shape[:2])
        img565, _ = tf(raw, None)
        img565s.append(img565)
        img352s.append(normalize(
            np.asarray(Image.fromarray(raw).resize(
                (args.clip_size, args.clip_size), Image.BILINEAR)),
            IMAGENET_MEAN, IMAGENET_STD))

    rep = np.repeat(np.stack(img352s), n_prompts, axis=0)
    conds = np.tile(np.asarray(cond, np.float32), (n, 1))
    cl_flat = run_in_chunks(clipseg_forward, (rep, conds), args.clip_batch)
    cl_all = cl_flat[..., 0].reshape(
        n, n_prompts, args.clip_size, args.clip_size).transpose(0, 2, 3, 1)

    ul_list = [None] * n
    buckets = {}
    for i, im in enumerate(img565s):
        buckets.setdefault(bucket_pad(im).shape[:2], []).append(i)
    for (bh, bw), idxs in buckets.items():
        for s in range(0, len(idxs), args.unet_batch):
            chunk = idxs[s : s + args.unet_batch]
            batch = np.zeros((args.unet_batch, bh, bw, 3), np.float32)
            for row, i in enumerate(chunk):
                im = img565s[i]
                batch[row, : im.shape[0], : im.shape[1]] = im
            out = np.asarray(unet_forward(jnp.asarray(batch)))
            for row, i in enumerate(chunk):
                h, w = img565s[i].shape[:2]
                ul_list[i] = out[row, :h, :w]

    for i in range(n):
        rh, rw = img565s[i].shape[:2]
        h, w = raw_hw[i]
        cl = resize_bilinear(jnp.asarray(cl_all[i])[None], (rh, rw))
        ul = jnp.asarray(ul_list[i])[None]
        pred = jnp.argmax(fuse_logits(cl, ul, alpha), axis=-1).astype(jnp.float32)
        pred = resize_nearest(pred[..., None], (h, w), mode="pil")[0, ..., 0]
        mask = (np.asarray(pred) * 255).astype(np.uint8)
        Image.fromarray(mask).convert("L").save(
            os.path.join(args.save_result, f"{ds.names[i]}.png"))
    print(f"wrote {n} masks to {args.save_result}")


if __name__ == "__main__":
    main()
