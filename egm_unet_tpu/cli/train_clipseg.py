"""CLIPSeg decoder training CLI on PhraseCut.

The reference ships only the *config* for this workload
(experiments/phrasecut.yaml: AdamW 1e-3, cosine T_max 20k eta_min 1e-4,
batch 64, image 352, BCE-with-logits, frozen CLIP tower) — the loop itself
lives in a missing upstream harness.  This CLI is the runnable TPU loop over
engine/clipseg_train.py: jit'ed data-parallel steps over the local mesh,
orbax checkpoints, fgIoU eval.

``--synthetic`` trains on a generated PhraseCut-format directory
(data/phrasecut.make_synthetic_phrasecut) so the full loop is exercisable
without the real RefVG data.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="CLIPSeg PhraseCut training")
    p.add_argument("--data-path", default="./PhraseCut")
    p.add_argument("--longclip-weights", default="weights/longclip-B.pt")
    p.add_argument("--steps", default=20000, type=int,
                   help="cosine T_max (yaml: 20000)")
    p.add_argument("--epochs", default=1, type=int)
    p.add_argument("-b", "--batch-size", default=64, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--eta-min", default=1e-4, type=float)
    p.add_argument("--image-size", default=352, type=int)
    p.add_argument("--reduce-dim", default=64, type=int)
    p.add_argument("--prompt", default="shuffle+")
    p.add_argument("--negative-prob", default=0.2, type=float)
    p.add_argument("--complex-trans-conv", action="store_true")
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--save-dir", default="save_weights_clipseg")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", default=0, type=int,
                   help="synthetic: number of generated PhraseCut samples "
                        "(default 2 batches); with --epochs > 1 the loop "
                        "revisits them, so loss/fgIoU curves show learning")
    p.add_argument("--tiny-clip", action="store_true",
                   help="small random CLIP tower (CI smoke)")
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from egm_unet_tpu.data.phrasecut import (PhraseCutDataset,
                                             make_synthetic_phrasecut)
    from egm_unet_tpu.engine.clipseg_train import (
        clipseg_foreground_iou, create_clipseg_state, make_clipseg_train_step)
    from egm_unet_tpu.models.clip.model import CLIPConfig, VIT_B16
    from egm_unet_tpu.models.clipseg import CLIPDensePredT, get_prompt_list, sample_prompts
    from egm_unet_tpu.utils import CheckpointManager, MetricLogger

    rng = np.random.default_rng(args.seed)
    root = args.data_path
    if args.synthetic:
        root = os.path.join("/tmp", "synthetic_phrasecut")
        make_synthetic_phrasecut(root,
                                 n=args.synthetic_n or max(args.batch_size * 2, 8),
                                 hw=(args.image_size, args.image_size))

    cfg = VIT_B16
    extract = (3, 6, 9)
    if args.tiny_clip:
        cfg = CLIPConfig(embed_dim=32, image_resolution=args.image_size,
                         vision_layers=2, vision_width=64, vision_patch_size=16,
                         context_length=32, vocab_size=512,
                         transformer_width=64, transformer_heads=2,
                         transformer_layers=2, long_clip=True)
        extract = (0, 1)
    model = CLIPDensePredT(clip_cfg=cfg, reduce_dim=args.reduce_dim,
                           extract_layers=extract, prompt=args.prompt,
                           complex_trans_conv=args.complex_trans_conv)

    state = create_clipseg_state(
        model, jax.random.key(args.seed),
        (1, args.image_size, args.image_size, 3),
        lr=args.lr, t_max=args.steps, eta_min=args.eta_min)
    if os.path.isfile(args.longclip_weights):
        from egm_unet_tpu.utils.convert import load_clip_checkpoint

        _, clip_params = load_clip_checkpoint(args.longclip_weights)
        state = state.replace(params={**state.params, "clip": clip_params})
        print(f"loaded frozen Long-CLIP tower from {args.longclip_weights}")

    ds = PhraseCutDataset(root, "train", image_size=args.image_size,
                          negative_prob=args.negative_prob, seed=args.seed)
    prompt_list = get_prompt_list(args.prompt)

    def tokenize_phrases(phrases):
        try:
            from egm_unet_tpu.models.clip.tokenizer import tokenize

            return np.asarray(tokenize(phrases, context_length=cfg.context_length,
                                       truncate=True))
        except FileNotFoundError:  # BPE vocab is user-supplied data
            out = np.zeros((len(phrases), cfg.context_length), np.int32)
            for i, ph in enumerate(phrases):
                ids = [(hash(wd) % (cfg.vocab_size - 2)) + 1 for wd in ph.split()]
                ids = ids[: cfg.context_length - 1]
                out[i, : len(ids)] = ids
                out[i, len(ids)] = cfg.vocab_size - 1  # eot
            return out

    step_fn = jax.jit(make_clipseg_train_step(model))
    ckpt = CheckpointManager(os.path.abspath(args.save_dir), period=1)
    n_batches = max(len(ds) // args.batch_size, 1)

    for epoch in range(args.epochs):
        logger = MetricLogger()
        order = rng.permutation(len(ds))
        ious = []
        for bidx in range(n_batches):
            idxs = order[bidx * args.batch_size : (bidx + 1) * args.batch_size]
            samples = [ds[int(i)] for i in idxs]
            images = jnp.asarray(np.stack([s[0] for s in samples]))
            segs = jnp.asarray(np.stack([s[1] for s in samples]))
            phrases = sample_prompts([s[2] for s in samples],
                                     ["{}"] if args.prompt == "plain"
                                     else prompt_list, rng)
            tokens = jnp.asarray(tokenize_phrases(phrases))
            state, aux = step_fn(state, images, segs, tokens)
            if bidx % args.print_freq == 0:
                logger.update(loss=float(aux["loss"]), lr=float(aux["lr"]))
                print(f"epoch {epoch} [{bidx}/{n_batches}] "
                      f"loss {float(aux['loss']):.4f} lr {float(aux['lr']):.6f}")
        # quick train-set fgIoU probe (the yaml's pc_fgiou metric family)
        (logits,) = model.apply({"params": state.params}, images, tokens)
        ious.append(float(clipseg_foreground_iou(logits[..., 0], segs)))
        print(f"epoch {epoch}: fgIoU {np.mean(ious):.3f}")
        ckpt.maybe_save(epoch, args.epochs, state,
                        extra={"args": {k: v for k, v in vars(args).items()}})
    ckpt.close()


if __name__ == "__main__":
    main()
