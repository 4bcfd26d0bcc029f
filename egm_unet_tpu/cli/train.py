"""Training CLI — preserves the reference's contract (ref: train.py:177-207):
same flags, epoch loop, per-epoch confusion-matrix + dice print, results-txt
appends, and checkpoint cadence — running as jit'ed sharded steps on TPU.

Extra flags over the reference: --model (registry name), --base-c,
--synthetic (train without the Baidu-pan TP-Dataset), --mesh-data (explicit
data-parallel width; defaults to all local devices).
"""

from __future__ import annotations

import argparse
import gc
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="egm_unet_tpu training")
    p.add_argument("--data-path", default="./dataset", help="TP-Dataset root")
    p.add_argument("--num-classes", default=1, type=int,
                   help="foreground classes (background added internally, ref train.py:80)")
    p.add_argument("--model", default="egm_unet")
    p.add_argument("--base-c", default=32, type=int)
    p.add_argument("-b", "--batch-size", default=8, type=int)
    p.add_argument("--epochs", default=200, type=int)
    p.add_argument("--lr", default=0.02, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight-decay", default=1e-4, type=float)
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--resume", default="", help="checkpoint dir to resume from")
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("--save-best", default=True, type=bool)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute (TPU equivalent of torch AMP)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-size", default=64, type=int)
    p.add_argument("--synthetic-n", default=None, type=int,
                   help="synthetic train-set size (default 4*batch; use 876 "
                        "to mirror the TP-928 train split)")
    p.add_argument("--synthetic-val-n", default=8, type=int,
                   help="synthetic val-set size (TP-928 val split: 52)")
    p.add_argument("--no-aux-losses", action="store_true",
                   help="train with plain CE only (drops the dice + laplace "
                        "+ lap + sobel terms of the reference recipe, ref: "
                        "train_utils/train_and_eval.py:7-19) — the "
                        "deliberately-wrong control for the training proof")
    p.add_argument("--synthetic-hard", action="store_true",
                   help="distractor-laden discriminative generator (yellow "
                        "lane lines/crosswalks, gray gratings, shadows, "
                        "low-contrast paving) — the training-proof task "
                        "where a wrong recipe visibly underperforms")
    p.add_argument("--val-batch-size", default=1, type=int,
                   help="eval batch (reference uses 1; synthetic val images "
                        "share a shape so larger batches are safe)")
    p.add_argument("--device-aug", action="store_true",
                   help="run scale/crop/flip/normalize on device as one "
                        "fused program (data/device_aug.py) instead of "
                        "host-side PIL transforms")
    p.add_argument("--device-cache", action="store_true",
                   help="upload the raw train set to HBM once and keep every "
                        "per-step op on device (data/device_cache.py) — each "
                        "step transfers only a [batch] index vector, which "
                        "zeroes the tunneled backend's per-wire-byte host-RSS "
                        "leak (PERF.md round 5); implies --device-aug, "
                        "single-device only, dataset must fit HBM")
    p.add_argument("--eval-size", default=565, type=int)
    p.add_argument("--mesh-data", default=None, type=int)
    p.add_argument("--mesh-spatial", default=1, type=int,
                   help="shard the image HEIGHT axis N-way over a "
                        "(data, spatial) mesh (parallel.get_mesh_sp) — "
                        "GSPMD inserts the conv halo exchanges; the "
                        "large-image mode for crops whose activations "
                        "exceed one chip's HBM")
    p.add_argument("--save-dir", default="save_weights")
    p.add_argument("--save-every", default=100, type=int,
                   help="periodic checkpoint cadence in epochs (best-dice "
                        "saves are additional); 10 for restart-proof "
                        "long runs (VERDICT r3 #4)")
    p.add_argument("--results-file", default=None)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--wire-uint8", action="store_true",
                   help="ship raw uint8 crops and normalize on device "
                        "(4x less H2D traffic; for ragged eval batches the "
                        "zero pad is then in pixel space, not normalized "
                        "space — same-shape batches are bit-identical)")
    p.add_argument("--steps-per-dispatch", default=1, type=int,
                   help="scan K train steps inside one jitted program "
                        "(engine.make_train_multistep) — amortizes the "
                        "per-launch host round-trip on tunneled/remote "
                        "TPUs; incompatible with --device-aug")
    p.add_argument("--grad-accum", default=1, type=int,
                   help="split each batch into N sequential microbatches "
                        "inside the jitted step, averaging grads into one "
                        "optimizer update (engine.make_train_step_accum) — "
                        "fits batch sizes whose monolithic backward OOMs "
                        "(e.g. 128 at 480px = 2 x 64 + --remat)")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint each stage in backward (large batches)")
    p.add_argument("--remat-fine", action="store_true",
                   help="additionally checkpoint each conv inside the stages "
                        "(bs 128 at 480px; implies --remat)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from egm_unet_tpu import metrics as M
    from egm_unet_tpu.data import DriveDataset, SyntheticTPDataset, collate_pad
    from egm_unet_tpu.data.loader import (BatchLoader, DevicePrefetcher,
                                          SuperBatcher, narrow_for_transfer)
    from egm_unet_tpu.data.transforms import EvalTransform, TrainTransform
    from egm_unet_tpu.engine import (create_train_state, make_eval_step,
                                     make_train_multistep, make_train_step,
                                     warmup_poly_schedule)
    from egm_unet_tpu.models import create_model
    from egm_unet_tpu.parallel import get_mesh, shard_batch
    from egm_unet_tpu.utils import CheckpointManager, MetricLogger, ResultsWriter

    num_classes = args.num_classes + 1
    dtype = jnp.bfloat16 if args.amp else jnp.float32

    if args.device_cache:
        args.device_aug = True  # the cache program embeds the augmentation
        if args.mesh_data is None:
            args.mesh_data = 1  # single-device path unless explicitly meshed
    if args.device_aug:
        # host loads raw sources at a fixed shape; the augmentation runs on
        # device as one jitted program per batch
        from egm_unet_tpu.data.transforms import TP_MEAN, TP_STD, resize_short_side

        crop = args.synthetic_size if args.synthetic else 480
        src_h = max(2 * crop, crop + 32)
        src_w = src_h

        class RawSource:
            def __call__(self, image, target):
                image, target = resize_short_side(image, target, src_h)
                img = np.zeros((src_h, src_w, 3), np.float32)
                tgt = np.zeros((src_h, src_w), np.int32)
                h, w = min(image.shape[0], src_h), min(image.shape[1], src_w)
                img[:h, :w] = image[:h, :w] / 255.0
                tgt[:h, :w] = target[:h, :w]
                return img, tgt

        train_tf = RawSource()
        dev_mean, dev_std = jnp.asarray(TP_MEAN), jnp.asarray(TP_STD)
        aug_key = jax.random.key(args.seed + 1)

        from egm_unet_tpu.data.device_aug import augment_batch

        def device_augment(key, images, targets):
            # short side scaled into [0.5, 1.2] x source, like the reference's
            # RandomResize relative to base_size (ref: train.py:17-18)
            return augment_batch(key, images, targets, dev_mean, dev_std,
                                 crop_size=crop,
                                 min_size=int(0.5 * src_h),
                                 max_size=int(1.2 * src_h))
    else:
        train_tf = TrainTransform(crop_size=(args.synthetic_size if args.synthetic else 480),
                                  seed=args.seed,
                                  wire_uint8=args.wire_uint8)
        device_augment = None

    if args.synthetic:
        train_ds = SyntheticTPDataset(n=args.synthetic_n or args.batch_size * 4,
                                      transforms=train_tf, cache=True,
                                      hard=args.synthetic_hard)
        # val MUST be disjoint from train: a distinct seed offset (the r03
        # proof's val was literally the first 52 train images)
        val_ds = SyntheticTPDataset(n=args.synthetic_val_n,
                                    transforms=EvalTransform(args.eval_size,
                                                             wire_uint8=args.wire_uint8),
                                    cache=True, hard=args.synthetic_hard,
                                    seed0=500_000)
    else:
        train_ds = DriveDataset(args.data_path, train_tf, "train.txt")
        val_ds = DriveDataset(args.data_path,
                              EvalTransform(args.eval_size,
                                            wire_uint8=args.wire_uint8),
                              "val.txt")

    train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed)
    val_loader = BatchLoader(val_ds, args.val_batch_size, shuffle=False,
                             drop_last=False, collate=collate_pad)

    model = create_model(args.model, num_classes=num_classes,
                         base_c=args.base_c, dtype=dtype,
                         remat="fine" if args.remat_fine else args.remat)
    sched = warmup_poly_schedule(args.lr, len(train_loader), args.epochs)
    state = create_train_state(model, jax.random.key(args.seed),
                               (1, 64, 64, 3), sched,
                               momentum=args.momentum, weight_decay=args.weight_decay)

    ckpt = CheckpointManager(os.path.abspath(args.save_dir),
                             period=args.save_every)
    start_epoch = args.start_epoch
    if args.resume:
        restored = CheckpointManager(os.path.abspath(args.resume)).restore(state)
        state, start_epoch = restored["state"], int(restored["epoch"]) + 1
        print(f"resumed from epoch {restored['epoch']}")

    n_spatial = max(1, args.mesh_spatial or 1)
    if n_spatial > 1:
        from egm_unet_tpu.parallel import get_mesh_sp

        mesh = get_mesh_sp(n_data=args.mesh_data, n_spatial=n_spatial)
    else:
        mesh = get_mesh(n_data=args.mesh_data) if (args.mesh_data or 0) > 1 or \
            (args.mesh_data is None and jax.device_count() > 1) else None
    if mesh is not None:
        # replicate state onto the mesh (restored checkpoints land on one
        # device; jit under the mesh requires mesh-consistent placement)
        from egm_unet_tpu.parallel import replicated

        state = jax.device_put(state, replicated(mesh))

    device_cache = None
    if args.device_cache:
        if mesh is not None:
            raise SystemExit("--device-cache is single-device (the real-chip "
                             "leak mitigation); drop --mesh-data/--mesh-spatial")
        from egm_unet_tpu.data.device_cache import DeviceDatasetCache

        device_cache = DeviceDatasetCache(
            train_ds, src_h, dev_mean, dev_std, crop_size=crop,
            min_size=int(0.5 * src_h), max_size=int(1.2 * src_h),
            out_dtype=dtype)
        device_augment = None  # augmentation runs inside the cache program
        print(f"device cache: {device_cache.n} samples, "
              f"{device_cache.hbm_bytes / 1e6:.0f} MB HBM resident")

    # donate the state: params/opt-state/BN-stats buffers are reused in
    # place instead of allocating a second copy per step
    k_steps = max(1, args.steps_per_dispatch)
    if k_steps > 1 and device_augment is not None:
        raise SystemExit("--steps-per-dispatch requires host-side "
                         "transforms (drop --device-aug)")
    norm = None
    if args.wire_uint8:
        from egm_unet_tpu.data.transforms import TP_MEAN, TP_STD

        norm = (TP_MEAN, TP_STD)
    accum = max(1, args.grad_accum)
    if accum > 1 and args.batch_size % accum:
        raise SystemExit(f"--batch-size {args.batch_size} must be divisible "
                         f"by --grad-accum {accum}")
    if k_steps > 1:
        train_step = jax.jit(make_train_multistep(num_classes=num_classes,
                                                  dice=not args.no_aux_losses,
                                                  normalize=norm,
                                                  input_dtype=dtype,
                                                  accum=accum),
                             donate_argnums=(0,))
    elif accum > 1:
        from egm_unet_tpu.engine import make_train_step_accum

        train_step = jax.jit(make_train_step_accum(accum,
                                                   num_classes=num_classes,
                                                   dice=not args.no_aux_losses,
                                                   normalize=norm,
                                                   input_dtype=dtype),
                             donate_argnums=(0,))
    else:
        train_step = jax.jit(make_train_step(num_classes=num_classes,
                                             dice=not args.no_aux_losses,
                                             normalize=norm,
                                             input_dtype=dtype),
                             donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(num_classes=num_classes,
                                       normalize=norm, input_dtype=dtype))
    results = ResultsWriter(args.results_file)

    import contextlib
    mesh_ctx = jax.set_mesh(mesh) if mesh else contextlib.nullcontext()

    # one-batch-ahead H2D: narrow wire dtypes (bf16 images / uint8 masks)
    # and start the device transfer from a worker thread so the tunneled
    # copy of batch N+1 overlaps step N's compute (data/loader.py).  The
    # device-aug path ships its raw f32 source crops unchanged — the
    # augmentation program defines the compute dtype there.
    def prepare_train(batch):
        im, tg = batch
        if device_augment is None:
            im, tg = narrow_for_transfer(im, tg, dtype)
        if mesh:
            if n_spatial > 1:
                from egm_unet_tpu.parallel.mesh import (
                    shard_batch_spatial, shard_superbatch_spatial)

                if k_steps > 1:
                    return shard_superbatch_spatial(mesh, im, tg)
                return shard_batch_spatial(mesh, im, tg)
            if k_steps > 1:
                from egm_unet_tpu.parallel.mesh import shard_superbatch

                return shard_superbatch(mesh, im, tg)
            return shard_batch(mesh, im, tg)
        return jax.device_put(im), jax.device_put(tg)

    def prepare_val(batch):
        im, tg = narrow_for_transfer(batch[0], batch[1], dtype)
        return jax.device_put(im), jax.device_put(tg)

    with mesh_ctx:
        best_dice = -1.0
        t_start = time.time()
        for epoch in range(start_epoch, args.epochs):
            logger = MetricLogger()
            # per-step scalar fetches serialize the device through the host
            # (on a tunneled TPU one fetch can cost seconds) — keep aux
            # scalars device-resident and fetch one stacked array per
            # print_freq window instead (ref contract: the per-step meter
            # postings of train_utils/train_and_eval.py:43-75)
            pending = []

            def flush_pending():
                if not pending:
                    return
                # aux entries are scalars (K=1) or [K] scan stacks
                losses = np.concatenate(
                    [np.atleast_1d(np.asarray(a["loss"])) for a in pending])
                lrs = np.concatenate(
                    [np.atleast_1d(np.asarray(a["lr"])) for a in pending])
                for lo, lr_ in zip(losses, lrs):
                    logger.update(loss=float(lo), lr=float(lr_))
                pending.clear()

            if device_cache is not None:
                # deterministic per-epoch key/permutation: kill/resume at
                # epoch N replays the same shuffle + augmentation draws the
                # uninterrupted run would have made (restart-proof contract)
                batch_iter = device_cache.epoch_iter(
                    jax.random.fold_in(aug_key, epoch), args.batch_size,
                    rng=np.random.default_rng(args.seed + epoch))
            else:
                source = train_loader if k_steps == 1 else SuperBatcher(
                    train_loader, k_steps)
                batch_iter = iter(DevicePrefetcher(source, prepare_train))
            window = max(1, args.print_freq // k_steps)
            step_i = 0
            for images, targets in logger.log_every(
                    batch_iter, window, f"Epoch: [{epoch}]"):
                if device_augment is not None:
                    aug_key, k = jax.random.split(aug_key)
                    images, targets = device_augment(k, images, targets)
                    images = images.astype(dtype)
                state, aux = train_step(state, images,
                                        targets.astype(jnp.int32))
                pending.append(aux)
                if step_i % window == 0:  # logger prints after this body
                    flush_pending()
                step_i += 1
            flush_pending()
            mean_loss = logger.meters["loss"].global_avg
            lr = logger.meters["lr"].value

            confmat = M.confmat_init(num_classes)
            dice = M.dice_init()
            for images, targets in DevicePrefetcher(val_loader, prepare_val):
                confmat, dice = eval_step(state, images,
                                          targets.astype(jnp.int32),
                                          confmat, dice)
            block = M.confmat_str(confmat)
            dice_val = float(dice.value)
            print(block)
            print(f"dice coefficient: {dice_val:.3f}")
            results.write_epoch(epoch, mean_loss, lr, block, dice_val)

            if args.save_best:
                ckpt.maybe_save(epoch, args.epochs, state, dice=dice_val,
                                extra={"args": vars(args)})
            else:
                ckpt.maybe_save(epoch, args.epochs, state,
                                extra={"args": vars(args)})
            best_dice = max(best_dice, dice_val)
            # Host-RSS hygiene.  r05 correction (tools/leak_probe.py): the
            # ~0.9 GB/epoch growth is a NATIVE leak in the axon plugin's
            # transfer staging (1:1 with wire bytes; gc finds 0 cyclic
            # objects, malloc_trim frees ~0) — this collect does NOT fix it
            # and the r04 attribution to cycle-delayed collection was wrong.
            # Kept to bound ordinary Python garbage on 200-epoch runs; the
            # real mitigations are --wire-uint8 (4x fewer wire bytes) and
            # checkpoint/resume (absorbed the r04 host-OOM kill).
            gc.collect()

        total = time.time() - t_start
        print(f"training time {total / 3600:.2f}h; best dice {best_dice:.3f}")
    ckpt.close()


if __name__ == "__main__":
    main()
