"""Long-CLIP contrastive fine-tune CLI.

The reference ships the training *forward* (clip/model.py:572-614: long/short
contrastive losses with PCA-32 image proxy and grad-preserving all_gather)
but no training script.  This CLI is the runnable TPU loop over
engine/longclip_train.py: data-parallel sharded steps over the local mesh
(differentiable all_gather in shard_map), AdamW on the trainable mask
(frozen ``positional_embedding``), logit-scale clamp, orbax checkpoints.

``--synthetic`` fine-tunes on random (image, long-text, short-text) triples
so the loop is exercisable without a captioned dataset; real use feeds
(image path, long caption, short caption) TSV via ``--data-tsv``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Long-CLIP fine-tune")
    p.add_argument("--clip-weights", default="weights/longclip-B.pt",
                   help="starting checkpoint (or an OpenAI CLIP .pt with "
                        "--stretch to apply the 77->248 positional stretch)")
    p.add_argument("--stretch", action="store_true",
                   help="input is a vanilla 77-ctx CLIP; stretch pos-emb "
                        "to 248 (ref: clip/clip.py:230-251)")
    p.add_argument("--data-tsv", default="",
                   help="TSV: image_path<TAB>long_caption<TAB>short_caption")
    p.add_argument("--steps", default=1000, type=int)
    p.add_argument("-b", "--batch-size", default=32, type=int)
    p.add_argument("--lr", default=1e-6, type=float)
    p.add_argument("--weight-decay", default=1e-2, type=float)
    p.add_argument("--warmup-steps", default=200, type=int)
    p.add_argument("--ratio-short", default=0.1, type=float)
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--save-dir", default="save_weights_longclip")
    p.add_argument("--save-every", default=500, type=int)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-fixed", default=0, type=int,
                   help="synthetic: cycle a FIXED set of N pregenerated "
                        "triples instead of fresh randoms each step — the "
                        "model can memorize the pairings, so the loss curve "
                        "demonstrably decreases (on-chip engine proof)")
    p.add_argument("--tiny-clip", action="store_true")
    p.add_argument("--mesh-data", default=None, type=int)
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from egm_unet_tpu.engine.longclip_train import (create_longclip_state,
                                                    make_longclip_train_step)
    from egm_unet_tpu.models.clip.model import CLIP, CLIPConfig, VIT_B16
    from egm_unet_tpu.parallel import get_mesh
    from egm_unet_tpu.utils import CheckpointManager

    rng = np.random.default_rng(args.seed)

    if args.tiny_clip:
        cfg = CLIPConfig(embed_dim=32, image_resolution=64, vision_layers=2,
                         vision_width=64, vision_patch_size=16,
                         context_length=32, vocab_size=512,
                         transformer_width=64, transformer_heads=2,
                         transformer_layers=2, long_clip=True)
        params = None
    elif os.path.isfile(args.clip_weights):
        from egm_unet_tpu.utils.convert import load_clip_checkpoint

        cfg_kw, params = load_clip_checkpoint(args.clip_weights,
                                              stretch_to_long=args.stretch)
        cfg = CLIPConfig(**cfg_kw)
        print(f"loaded {args.clip_weights} (ctx {cfg.context_length})")
    else:
        cfg, params = VIT_B16, None
        print("WARNING: no checkpoint; fine-tuning a random tower")

    model = CLIP(cfg)
    if params is None:
        params = model.init(
            jax.random.key(args.seed),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32))["params"]

    n_dev = args.mesh_data or jax.device_count()
    mesh = get_mesh(n_data=n_dev) if n_dev > 1 else None
    state = create_longclip_state(model, params, lr=args.lr,
                                  weight_decay=args.weight_decay,
                                  warmup_steps=args.warmup_steps,
                                  total_steps=args.steps)
    step_fn = jax.jit(make_longclip_train_step(model, mesh=mesh,
                                               ratio_short=args.ratio_short))

    def synthetic_batch():
        img = rng.standard_normal(
            (args.batch_size, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32)
        tl = rng.integers(1, cfg.vocab_size - 1,
                          (args.batch_size, cfg.context_length))
        ts = rng.integers(1, cfg.vocab_size - 1,
                          (args.batch_size, cfg.context_length))
        return img, tl.astype(np.int32), ts.astype(np.int32)

    if args.synthetic_fixed:
        n = max(args.synthetic_fixed, args.batch_size)
        pool_img = rng.standard_normal(
            (n, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32)
        pool_tl = rng.integers(1, cfg.vocab_size - 1,
                               (n, cfg.context_length)).astype(np.int32)
        pool_ts = rng.integers(1, cfg.vocab_size - 1,
                               (n, cfg.context_length)).astype(np.int32)

        def synthetic_batch():  # noqa: F811 — fixed-set variant
            idx = rng.choice(n, args.batch_size, replace=False)
            return pool_img[idx], pool_tl[idx], pool_ts[idx]

    def tsv_batches():
        from PIL import Image

        from egm_unet_tpu.models.clip.tokenizer import tokenize

        rows = [ln.rstrip("\n").split("\t")
                for ln in open(args.data_tsv) if ln.strip()]
        while True:
            idxs = rng.permutation(len(rows))
            for s in range(0, len(rows) - args.batch_size + 1, args.batch_size):
                chunk = [rows[i] for i in idxs[s : s + args.batch_size]]
                imgs = []
                for path, _, _ in chunk:
                    im = Image.open(path).convert("RGB").resize(
                        (cfg.image_resolution, cfg.image_resolution))
                    imgs.append(np.asarray(im, np.float32) / 255.0)
                tl = tokenize([c[1] for c in chunk],
                              context_length=cfg.context_length, truncate=True)
                ts = tokenize([c[2] for c in chunk],
                              context_length=cfg.context_length, truncate=True)
                yield (np.stack(imgs), np.asarray(tl, np.int32),
                       np.asarray(ts, np.int32))

    batches = tsv_batches() if args.data_tsv else None

    import contextlib
    ckpt = CheckpointManager(os.path.abspath(args.save_dir),
                             period=args.save_every)
    with (jax.set_mesh(mesh) if mesh else contextlib.nullcontext()):
        if mesh:
            from egm_unet_tpu.parallel import replicated

            state = jax.device_put(state, replicated(mesh))
        for it in range(args.steps):
            img, tl, ts = (next(batches) if batches else synthetic_batch())
            if mesh:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(mesh, P("data"))
                img, tl, ts = (jax.device_put(jnp.asarray(a), sh)
                               for a in (img, tl, ts))
            state, aux = step_fn(state, jnp.asarray(img), jnp.asarray(tl),
                                 jnp.asarray(ts))
            if it % args.print_freq == 0:
                print(f"step {it}: loss {float(aux['loss']):.4f} "
                      f"lr {float(aux['lr']):.2e}")
            ckpt.maybe_save(it, args.steps, state)
    ckpt.close()
    print("done")


if __name__ == "__main__":
    main()
