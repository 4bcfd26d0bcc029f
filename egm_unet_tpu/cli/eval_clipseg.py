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
    p.add_argument("--clip-batch", default=32, type=int,
                   help="fixed CLIPSeg device batch (one compiled program)")
    p.add_argument("--unet-batch", default=16, type=int,
                   help="fixed UNet device batch per shape bucket")
    p.add_argument("--tiny-clip", action="store_true",
                   help="small random CLIP tower (CI smoke; no checkpoints)")
    p.add_argument("--timed-passes", default=1, type=int,
                   help="run the dual-branch device compute N times and "
                        "time each pass: pass 1 is cold (includes compiles), "
                        "pass >=2 is the warm steady-state throughput the "
                        "reference prints as FPS (ref: eval_CLIPseg.py:933-"
                        "934).  Results come from the last pass (identical "
                        "inputs -> identical outputs)")
    return p.parse_args(argv)


def run_in_chunks(forward, inputs, batch_size: int):
    """Run [N, ...] host arrays through ``forward`` in fixed-size zero-padded
    chunks: ONE compiled program, ceil(N / batch_size) dispatches — instead
    of the reference's per-image loop (ref: eval_CLIPseg.py:855-891).
    Padding rows are zeros; their outputs are dropped."""
    import jax.numpy as jnp

    n = inputs[0].shape[0]
    outs = []
    for s in range(0, n, batch_size):
        chunk = [np.asarray(a[s:s + batch_size]) for a in inputs]
        pad = batch_size - chunk[0].shape[0]
        if pad:
            chunk = [np.concatenate(
                [c, np.zeros((pad,) + c.shape[1:], c.dtype)]) for c in chunk]
        out = np.asarray(forward(*[jnp.asarray(c) for c in chunk]))
        outs.append(out[: batch_size - pad] if pad else out)
    return np.concatenate(outs, axis=0)


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
    if getattr(args, "tiny_clip", False):
        cfg = CLIPConfig(embed_dim=32, image_resolution=args.clip_size,
                         vision_layers=2, vision_width=64, vision_patch_size=16,
                         context_length=32, vocab_size=512,
                         transformer_width=64, transformer_heads=2,
                         transformer_layers=2, long_clip=True)
    params_clip = None
    if os.path.isfile(args.longclip_weights):
        cfg_kw, params_clip = load_clip_checkpoint(args.longclip_weights)
        cfg = CLIPConfig(**cfg_kw)
        print(f"loaded Long-CLIP tower from {args.longclip_weights}")
    extract = ((0, 1) if getattr(args, "tiny_clip", False) else (3, 6, 9))
    model = CLIPDensePredT(clip_cfg=cfg, reduce_dim=64, extract_layers=extract)
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
    # variables ride as jit ARGUMENTS, not closure constants: baked-in
    # weights bloat the serialized program (the ViT tower alone is ~600 MB
    # of constants — over the axon remote-compile request limit, HTTP 413)
    # and defeat XLA constant-memory budgeting.
    unet_vars = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats})

    @jax.jit
    def _unet_apply(v, x):
        return unet.apply(v, x, train=False)["out"]

    def unet_forward(x):
        return _unet_apply(unet_vars, x)

    # --- CLIPSeg branch
    clipseg, clipseg_vars = build_clipseg(args)
    clipseg_vars = jax.device_put(clipseg_vars)

    @jax.jit
    def _clipseg_apply(v, x, cond):
        (logits,) = clipseg.apply(v, x, cond)
        return logits

    def clipseg_forward(x, cond):
        return _clipseg_apply(clipseg_vars, x, cond)

    # text conditioning: batched prompts, one forward each (vmap-free batched
    # image repeat is unnecessary — prompts share the image encoder pass in
    # batch dim)
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

    ds = (SyntheticTPDataset(8) if args.synthetic
          else DriveDataset(args.data_path, None, args.txt_name))
    tf = EvalTransform(args.base_size)
    n = len(ds)
    n_prompts = len(args.prompts)

    # ---- host preprocessing (both branch inputs + label shapes)
    targets, img565s, img352s = [], [], []
    for i in range(n):
        raw, target = ds[i]
        targets.append(target.astype(np.int32))
        img565, _ = tf(raw, None)  # ref: eval_CLIPseg.py:821-827 (TP stats)
        img565s.append(img565)
        img352s.append(normalize(  # ref: eval_CLIPseg.py:830-834 (CLIP stats)
            np.asarray(Image.fromarray(raw).resize(
                (args.clip_size, args.clip_size), Image.BILINEAR)),
            IMAGENET_MEAN, IMAGENET_STD))

    def run_branches():
        # ---- CLIPSeg branch: one compiled program, ceil(N*P / clip_batch)
        # dispatches (vs the reference's per-image loop,
        # eval_CLIPseg.py:875-882)
        rep = np.repeat(np.stack(img352s), n_prompts, axis=0)  # img-major
        conds = np.tile(np.asarray(cond, np.float32), (n, 1))
        cl_flat = run_in_chunks(clipseg_forward, (rep, conds), args.clip_batch)
        # [N*P, S, S, 1] -> per-image [S, S, P]
        cl = cl_flat[..., 0].reshape(
            n, n_prompts, args.clip_size, args.clip_size).transpose(0, 2, 3, 1)

        # ---- UNet branch: shape buckets x fixed batches (like
        # serving.Predictor)
        ul = [None] * n
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
                    ul[i] = out[row, :h, :w]
        return cl, ul

    # pass 1 is the cold session (compiles included); pass >= 2 times the
    # warm dual-branch steady state (bench.py's fusion_eval_warm_throughput)
    import time as _time

    for pnum in range(max(1, args.timed_passes)):
        t0 = _time.perf_counter()
        cl_all, ul_list = run_branches()
        dt = _time.perf_counter() - t0
        print(f"# branch pass {pnum + 1}: {n / max(dt, 1e-9):.2f} img/s "
              f"({dt:.2f}s for {n} images x {n_prompts} prompts)", flush=True)

    # ---- per-label-size groups: batched resize to the UNet grid (bilinear,
    # ref: eval_CLIPseg.py:885-888) then NEAREST both branches to label size
    # (a gather, so it commutes with fusion and argmax — matching the
    # reference's "argmax then NEAREST-resize" exactly), one confmat batch
    # per group for the alpha sweep.
    groups = {}
    for i in range(n):
        key = (img565s[i].shape[:2], targets[i].shape[:2])
        groups.setdefault(key, []).append(i)

    pairs = []
    group_order = []
    for ((rh, rw), (lh, lw)), idxs in groups.items():
        cl = jnp.asarray(np.stack([cl_all[i] for i in idxs]))
        ul = jnp.asarray(np.stack([ul_list[i] for i in idxs]))
        cl = resize_bilinear(cl, (rh, rw))
        cl = resize_nearest(cl, (lh, lw), mode="pil")
        ul = resize_nearest(ul, (lh, lw), mode="pil")
        labels = jnp.asarray(np.stack([targets[i] for i in idxs]))
        pairs.append((cl, ul, labels))
        group_order.append(idxs)

    best_alpha, best_miou, _ = search_best_alpha(pairs)
    print(f"best alpha: {best_alpha:.4f}  val mIoU: {best_miou * 100:.2f}")
    save_alpha(best_alpha, args.alpha_file)

    os.makedirs(args.save_result, exist_ok=True)
    for (cl, ul, _), idxs in zip(pairs, group_order):
        preds = np.asarray(jnp.argmax(fuse_logits(cl, ul, best_alpha), axis=-1))
        for row, i in enumerate(idxs):
            Image.fromarray((preds[row] * 255).astype(np.uint8)).save(
                os.path.join(args.save_result, f"{ds.names[i]}.png"))
    print(f"wrote {n} masks to {args.save_result}")


if __name__ == "__main__":
    main()
