"""Fusion eval + alpha search CLI (ref: eval_CLIPseg.py:796-934).

Pipeline per val image:
1. GRFB/EGM-UNet logits at Resize(565) + TP stats;
2. CLIPSeg logits at 352x352 + CLIP stats, batched over prompts
   (['background', 'Tactile paving'], ref: eval_CLIPseg.py:812), bilinearly
   resized to the UNet grid;
3. vectorized alpha grid search (linspace 0.1..10, 100 points) on global
   val mIoU -> best_alpha.txt;
4. re-render masks with the best alpha (0 -> 0, 1 -> 255).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="./dataset")
    p.add_argument("--txt-name", default="val.txt")
    p.add_argument("--unet-weights", default="save_weights")
    p.add_argument("--clipseg-weights", default="weights/rd64-uni.pth")
    p.add_argument("--longclip-weights", default="weights/longclip-B.pt")
    p.add_argument("--model", default="grfb_unet")
    p.add_argument("--base-c", default=32, type=int)
    p.add_argument("--prompts", nargs="+", default=["background", "Tactile paving"])
    p.add_argument("--clip-size", default=352, type=int)
    p.add_argument("--base-size", default=565, type=int)
    p.add_argument("--alpha-file", default="best_alpha.txt")
    p.add_argument("--save-result", default="./predict/fusion_eval")
    p.add_argument("--synthetic", action="store_true")
    return p.parse_args(argv)


def build_clipseg(args):
    """CLIPDensePredT(ViT-B/16, reduce_dim=64) with longclip tower +
    rd64-uni decoder when checkpoint files exist; random init otherwise."""
    import jax
    import jax.numpy as jnp

    from egm_unet_tpu.models.clip.model import CLIPConfig, VIT_B16
    from egm_unet_tpu.models.clipseg import CLIPDensePredT
    from egm_unet_tpu.utils.convert import (clipseg_decoder_from_torch,
                                            load_clip_checkpoint, merge_params)

    cfg = VIT_B16
    params_clip = None
    if os.path.isfile(args.longclip_weights):
        cfg_kw, params_clip = load_clip_checkpoint(args.longclip_weights)
        cfg = CLIPConfig(**cfg_kw)
        print(f"loaded Long-CLIP tower from {args.longclip_weights}")
    model = CLIPDensePredT(clip_cfg=cfg, reduce_dim=64)
    img0 = jnp.zeros((1, args.clip_size, args.clip_size, 3))
    tok0 = jnp.zeros((1, cfg.context_length), jnp.int32)  # token init
    variables = model.init(jax.random.key(0), img0, tok0)  # materializes text tower
    params = dict(variables["params"])
    if params_clip is not None:
        params["clip"] = params_clip
    if os.path.isfile(args.clipseg_weights):
        import torch

        sd = torch.load(args.clipseg_weights, map_location="cpu", weights_only=False)
        params = merge_params(params, clipseg_decoder_from_torch(sd))
        print(f"loaded CLIPSeg decoder from {args.clipseg_weights} (strict=False)")
    else:
        print("WARNING: no rd64 checkpoint; CLIPSeg decoder randomly initialized")
    return model, {"params": params}


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from PIL import Image

    from egm_unet_tpu.data import DriveDataset, SyntheticTPDataset
    from egm_unet_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                              EvalTransform, normalize)
    from egm_unet_tpu.engine import create_train_state, warmup_poly_schedule
    from egm_unet_tpu.engine.fusion import fuse_logits, save_alpha, search_best_alpha
    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.models.clip.tokenizer import tokenize
    from egm_unet_tpu.ops.resize import resize_bilinear, resize_nearest
    from egm_unet_tpu.utils import CheckpointManager
    from egm_unet_tpu.cli.predict import bucket_pad

    # --- UNet branch
    unet = create_model(args.model, num_classes=2, base_c=args.base_c)
    state = create_train_state(unet, jax.random.key(0), (1, 64, 64, 3),
                               warmup_poly_schedule(0.02, 1, 1))
    if os.path.isdir(args.unet_weights):
        state = CheckpointManager(args.unet_weights).restore(state)["state"]
    unet_vars = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def unet_forward(x):
        return unet.apply(unet_vars, x, train=False)["out"]

    # --- CLIPSeg branch
    clipseg, clipseg_vars = build_clipseg(args)

    @jax.jit
    def clipseg_forward(x, cond):
        (logits,) = clipseg.apply(clipseg_vars, x, cond)
        return logits

    # text conditioning: batched prompts, one forward each (vmap-free batched
    # image repeat is unnecessary — prompts share the image encoder pass in
    # batch dim)
    try:
        tokens = jnp.asarray(tokenize(args.prompts, truncate=True))
        cond = clipseg.apply(clipseg_vars, tokens,
                             method=clipseg.compute_conditional)
    except FileNotFoundError:
        print("WARNING: BPE vocab missing; using random prompt embeddings")
        cond = jax.random.normal(jax.random.key(1),
                                 (len(args.prompts), clipseg.clip_cfg.embed_dim))

    ds = (SyntheticTPDataset(8) if args.synthetic
          else DriveDataset(args.data_path, None, args.txt_name))
    tf = EvalTransform(args.base_size)

    pairs = []
    for i in range(len(ds)):
        raw, target = ds[i]
        lh, lw = target.shape[:2]
        # UNet logits at 565 short side + TP stats (ref: eval_CLIPseg.py:821-827)
        img565, _ = tf(raw, None)
        rh, rw = img565.shape[:2]
        ul = unet_forward(jnp.asarray(bucket_pad(img565)[None]))[:, :rh, :rw]
        # CLIPSeg logits at exact 352x352 + ImageNet stats
        # (ref: eval_CLIPseg.py:830-834); one output channel per prompt
        img352 = normalize(
            np.asarray(Image.fromarray(raw).resize((args.clip_size, args.clip_size),
                                                   Image.BILINEAR)),
            IMAGENET_MEAN, IMAGENET_STD)
        x352 = jnp.broadcast_to(jnp.asarray(img352)[None],
                                (len(args.prompts), *img352.shape))
        cl = clipseg_forward(x352, cond)  # [P, 352, 352, 1]
        cl = jnp.transpose(cl[..., 0], (1, 2, 0))[None]  # [1, 352, 352, P]
        # bilinear to the UNet grid (ref: eval_CLIPseg.py:885-888), then
        # NEAREST both branches to label size — a gather, so it commutes
        # with fusion and argmax, matching the reference's
        # "argmax then NEAREST-resize to label size" exactly.
        cl = resize_bilinear(cl, (rh, rw))
        cl = resize_nearest(cl, (lh, lw), mode="pil")
        ul = resize_nearest(ul, (lh, lw), mode="pil")
        labels = jnp.asarray(target.astype(np.int32))[None]
        pairs.append((cl, ul, labels))

    best_alpha, best_miou, _ = search_best_alpha(pairs)
    print(f"best alpha: {best_alpha:.4f}  val mIoU: {best_miou * 100:.2f}")
    save_alpha(best_alpha, args.alpha_file)

    os.makedirs(args.save_result, exist_ok=True)
    for i, (cl, ul, _) in enumerate(pairs):
        pred = np.asarray(jnp.argmax(fuse_logits(cl, ul, best_alpha), axis=-1))[0]
        Image.fromarray((pred * 255).astype(np.uint8)).save(
            os.path.join(args.save_result, f"{ds.names[i]}.png"))
    print(f"wrote {len(pairs)} masks to {args.save_result}")


if __name__ == "__main__":
    main()
