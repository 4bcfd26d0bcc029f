"""Checkpoint conversion CLI: reference torch ``.pth`` -> orbax checkpoint
usable by our train/predict CLIs.

    python -m egm_unet_tpu.cli.convert --kind egm --torch model_best.pth \
        --out save_weights --model egm_unet --base-c 32
    python -m egm_unet_tpu.cli.convert --kind clip --torch longclip-B.pt \
        --out weights_jax/longclip
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--kind", choices=["egm", "clip"], default="egm")
    p.add_argument("--torch", required=True, help="torch checkpoint path")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--model", default="egm_unet")
    p.add_argument("--base-c", default=32, type=int)
    p.add_argument("--num-classes", default=2, type=int)
    p.add_argument("--stretch-long", action="store_true",
                   help="apply the Long-CLIP 77->248 positional stretch")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from egm_unet_tpu.engine import create_train_state, warmup_poly_schedule
    from egm_unet_tpu.utils import CheckpointManager

    if args.kind == "egm":
        from egm_unet_tpu.models import MODEL_CONFIGS, create_model
        from egm_unet_tpu.utils.convert_unet import load_egm_checkpoint

        cfg = MODEL_CONFIGS.get(args.model, {})
        params, stats = load_egm_checkpoint(
            args.torch,
            block=cfg.get("block", "edge"),
            use_rga=cfg.get("use_rga", True),
            use_mca=cfg.get("use_mca", True))
        model = create_model(args.model, num_classes=args.num_classes,
                             base_c=args.base_c)
        state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3),
                                   warmup_poly_schedule(0.02, 1, 1))
        state = state.replace(params=params, batch_stats=stats)
        mngr = CheckpointManager(os.path.abspath(args.out))
        mngr.maybe_save(0, 1, state)
        mngr.close()
        print(f"wrote orbax checkpoint to {args.out}")
    else:
        import numpy as np
        import orbax.checkpoint as ocp

        from egm_unet_tpu.utils.convert import load_clip_checkpoint

        cfg_kw, params = load_clip_checkpoint(args.torch,
                                              stretch_to_long=args.stretch_long)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.out),
                   {"config": {k: np.asarray(v) for k, v in cfg_kw.items()
                               if isinstance(v, (int, float, bool))},
                    "params": params})
        ckptr.wait_until_finished()
        print(f"wrote CLIP params to {args.out} (config: {cfg_kw})")


if __name__ == "__main__":
    main()
