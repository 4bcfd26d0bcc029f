"""End-to-end acceptance: train a small model on synthetic data, predict
masks, score them with the offline evaluator — the reference's de-facto
acceptance loop (SURVEY.md §4: record logs + evaluating_indicator)."""

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from egm_unet_tpu import metrics as M
from egm_unet_tpu.cli.evaluating_indicator import compute_miou, per_class_iu
from egm_unet_tpu.data.synthetic import synthetic_tp_batch, synthetic_tp_sample
from egm_unet_tpu.engine import create_train_state, make_train_step, warmup_poly_schedule
from egm_unet_tpu.models import create_model


def test_train_predict_evaluate_loop(tmp_path):
    # --- train a small UNet on synthetic data
    model = create_model("unet", base_c=8)
    steps_per_epoch, epochs = 4, 4
    sched = warmup_poly_schedule(0.02, steps_per_epoch, epochs)
    state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3), sched)
    step = jax.jit(make_train_step(num_classes=2))
    for e in range(epochs):
        imgs, tgts = synthetic_tp_batch(8, 64, seed=e)
        for _ in range(steps_per_epoch):
            state, aux = step(state, jnp.asarray(imgs), jnp.asarray(tgts))
    assert float(aux["loss"]) < 2.0

    # --- predict masks for held-out samples, save PNGs like cli/predict
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    gt_dir, pred_dir = tmp_path / "gt", tmp_path / "pred"
    gt_dir.mkdir(), pred_dir.mkdir()
    names = []
    from egm_unet_tpu.data.transforms import TP_MEAN, TP_STD, normalize

    for i in range(4):
        img, mask = synthetic_tp_sample(9000 + i, 64, 64)
        x = jnp.asarray(normalize(img, TP_MEAN, TP_STD))[None]
        logits = model.apply(variables, x, train=False)["out"]
        pred = np.asarray(jnp.argmax(logits[0], axis=-1)).astype(np.uint8) * 255
        name = f"s{i}"
        names.append(name)
        Image.fromarray(pred).save(pred_dir / f"{name}.png")
        Image.fromarray((mask * 255).astype(np.uint8)).save(gt_dir / f"{name}.png")

    # --- offline evaluator closes the loop
    hist, skipped = compute_miou(str(gt_dir), str(pred_dir), names, 2)
    assert skipped == 0
    miou = float(np.nanmean(per_class_iu(hist)))
    assert miou > 0.55, f"e2e mIoU too low: {miou}"

    # the on-device confusion matrix agrees with the PNG evaluator
    dev_mat = M.confmat_init(2)
    for i in range(4):
        img, mask = synthetic_tp_sample(9000 + i, 64, 64)
        x = jnp.asarray(normalize(img, TP_MEAN, TP_STD))[None]
        logits = model.apply(variables, x, train=False)["out"]
        dev_mat = M.confmat_update(dev_mat, jnp.asarray(mask.astype(np.int32))[None],
                                   jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(np.asarray(dev_mat), hist)
