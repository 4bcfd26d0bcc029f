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
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from egm_unet_tpu.cli.eval_clipseg import build_clipseg
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
    unet_vars = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def unet_forward(x):
        return unet.apply(unet_vars, x, train=False)["out"]

    clipseg, clipseg_vars = build_clipseg(args)

    @jax.jit
    def clipseg_forward(x, cond):
        (logits,) = clipseg.apply(clipseg_vars, x, cond)
        return logits

    try:
        tokens = jnp.asarray(tokenize(args.prompts, truncate=True))
        cond = clipseg.apply(clipseg_vars, tokens, method=clipseg.compute_conditional)
    except FileNotFoundError:
        print("WARNING: BPE vocab missing; using random prompt embeddings")
        cond = jax.random.normal(jax.random.key(1),
                                 (len(args.prompts), clipseg.clip_cfg.embed_dim))

    ds = (SyntheticTPDataset(4) if args.synthetic
          else DriveDataset(args.data_path, None, args.txt_name))
    tf = EvalTransform(args.base_size)
    os.makedirs(args.save_result, exist_ok=True)

    for i in range(len(ds)):
        raw, _ = ds[i]
        h, w = raw.shape[:2]
        img565, _ = tf(raw, None)
        rh, rw = img565.shape[:2]
        ul = unet_forward(jnp.asarray(bucket_pad(img565)[None]))[:, :rh, :rw]
        img352 = normalize(
            np.asarray(Image.fromarray(raw).resize((args.clip_size, args.clip_size),
                                                   Image.BILINEAR)),
            IMAGENET_MEAN, IMAGENET_STD)
        x352 = jnp.broadcast_to(jnp.asarray(img352)[None],
                                (len(args.prompts), *img352.shape))
        cl = clipseg_forward(x352, cond)
        cl = jnp.transpose(cl[..., 0], (1, 2, 0))[None]
        cl = resize_bilinear(cl, (rh, rw))
        pred = jnp.argmax(fuse_logits(cl, ul, alpha), axis=-1).astype(jnp.float32)
        pred = resize_nearest(pred[..., None], (h, w), mode="pil")[0, ..., 0]
        mask = (np.asarray(pred) * 255).astype(np.uint8)
        Image.fromarray(mask).convert("L").save(
            os.path.join(args.save_result, f"{ds.names[i]}.png"))
    print(f"wrote {len(ds)} masks to {args.save_result}")


if __name__ == "__main__":
    main()
