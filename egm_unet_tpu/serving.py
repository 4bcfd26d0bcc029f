"""Batched inference API for production serving.

The reference's serving story is per-image script loops (predict.py /
predict_CLIPseg.py).  ``Predictor`` is the TPU-native equivalent: requests
are normalized, resized to shape buckets, packed into fixed-size device
batches (one compiled program per bucket, cached), and unpacked back to
per-image masks at original resolution.  Padding slots use zero images whose
outputs are discarded, so arbitrary request counts run at full batch
efficiency.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PredictorConfig:
    model_name: str = "egm_unet"
    base_c: int = 32
    num_classes: int = 2
    batch_size: int = 128  # lane-aligned sweet spot on v5e (PERF.md)
    base_size: int = 565  # short-side resize, like the reference eval
    pad_multiple: int = 64
    dtype: str = "bfloat16"
    fold_bn: bool = True  # inference BN folding (exact; see models/fold_bn.py)
    # kernel impl choices, traced into the compiled program: 'xla' | 'pallas'
    # (pallas = fused MCALayer / decoder-stage kernels; see PERF.md for the
    # measured defaults). None = respect $EGM_MCA_IMPL / $EGM_UP_IMPL.
    mca_impl: Optional[str] = None
    up_impl: Optional[str] = None
    # 'int8': serving-only dynamic quantization (ops/quant.py) — off-parity
    # (bench.py reports the mask-agreement stat); None = full precision
    quant: Optional[str] = None


class Predictor:
    def __init__(self, variables, config: PredictorConfig = PredictorConfig(),
                 mean=None, std=None):
        from egm_unet_tpu.data.transforms import TP_MEAN, TP_STD
        from egm_unet_tpu.models import create_model
        from egm_unet_tpu.models.fold_bn import fold_bn_variables

        self.cfg = config
        self.dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        fold = config.fold_bn and "batch_stats" in variables
        self.model = create_model(config.model_name, num_classes=config.num_classes,
                                  base_c=config.base_c, dtype=self.dtype,
                                  fold_bn=fold, mca_impl=config.mca_impl,
                                  up_impl=config.up_impl)
        if fold:
            variables = fold_bn_variables(variables)
        if self.dtype == jnp.bfloat16:
            # deployment weight cast (+4% on v5e: drops BN-param convert
            # fusions); argmax masks are insensitive to the precision loss
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(self.dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                variables)
        self.variables = variables
        self.mean = TP_MEAN if mean is None else mean
        self.std = TP_STD if std is None else std
        self._compiled = {}
        # int8: activation ranges are calibrated from the first real batch
        # (static scales -> the quantize fuses into producers; see
        # ops/quant.py)
        self._calibrated = config.quant is None

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str,
                        config: PredictorConfig = PredictorConfig(), **kw):
        from egm_unet_tpu.engine import create_train_state, warmup_poly_schedule
        from egm_unet_tpu.models import create_model
        from egm_unet_tpu.utils import CheckpointManager

        model = create_model(config.model_name, num_classes=config.num_classes,
                             base_c=config.base_c)
        state = create_train_state(model, jax.random.key(0), (1, 64, 64, 3),
                                   warmup_poly_schedule(0.02, 1, 1))
        state = CheckpointManager(ckpt_dir).restore(state)["state"]
        return cls({"params": state.params, "batch_stats": state.batch_stats},
                   config, **kw)

    def _forward(self, bucket_hw):
        # impl switches travel as module attributes (create_model above), so
        # tracing here never touches process-global env state; the quant mode
        # is a contextvar held around every call (jit traces lazily on the
        # first real batch, so the context must wrap calls, not the def)
        key = bucket_hw
        if key not in self._compiled:
            from egm_unet_tpu.utils.compile_opts import tpu_compiler_options

            # measured TPU compiler defaults (scoped-VMEM budget, PERF.md
            # round 3: +8% on the 512px headline); None on CPU backends
            @functools.partial(jax.jit,
                               compiler_options=tpu_compiler_options())
            def fwd(v, x):
                return jnp.argmax(
                    self.model.apply(v, x, train=False)["out"], axis=-1)

            if self.cfg.quant:
                from egm_unet_tpu.ops.quant import quantized

                def fwd_q(v, x, _fwd=fwd):
                    with quantized(self.cfg.quant):
                        return _fwd(v, x)

                self._compiled[key] = fwd_q
            else:
                self._compiled[key] = fwd
        return self._compiled[key]

    def _preprocess(self, image: np.ndarray):
        from egm_unet_tpu.data.transforms import normalize, resize_short_side

        resized, _ = resize_short_side(image, None, self.cfg.base_size)
        return normalize(resized, self.mean, self.std)

    def predict(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        """uint8 HWC images (any sizes) -> per-image int mask at the
        original resolution."""
        from egm_unet_tpu.ops.resize import resize_bilinear

        m = self.cfg.pad_multiple
        prepped = [self._preprocess(img) for img in images]
        # group indices by bucket shape
        buckets = {}
        for i, p in enumerate(prepped):
            bh = -(-p.shape[0] // m) * m
            bw = -(-p.shape[1] // m) * m
            buckets.setdefault((bh, bw), []).append(i)

        results: List[Optional[np.ndarray]] = [None] * len(images)
        for (bh, bw), idxs in buckets.items():
            fwd = self._forward((bh, bw))
            bs = self.cfg.batch_size
            for start in range(0, len(idxs), bs):
                chunk = idxs[start : start + bs]
                # always a full fixed-size batch: padding slots are zero
                # images whose outputs are discarded (one program per bucket)
                batch = np.zeros((bs, bh, bw, 3), np.float32)
                for row, i in enumerate(chunk):
                    p = prepped[i]
                    batch[row, : p.shape[0], : p.shape[1]] = p
                if not self._calibrated:
                    from egm_unet_tpu.ops.quant import calibrate_quant_scales

                    scales = calibrate_quant_scales(
                        self.model, self.variables,
                        [jnp.asarray(batch, self.dtype)])
                    self.variables = {**self.variables, "quant_scales": scales}
                    self._calibrated = True
                preds = np.asarray(fwd(self.variables,
                                       jnp.asarray(batch, self.dtype)))
                for row, i in enumerate(chunk):
                    p = prepped[i]
                    h, w = images[i].shape[:2]
                    mask = preds[row, : p.shape[0], : p.shape[1]].astype(np.float32)
                    full = resize_bilinear(jnp.asarray(mask)[..., None], (h, w))
                    results[i] = np.rint(np.asarray(full[..., 0])).astype(np.uint8)
        return results  # type: ignore[return-value]
