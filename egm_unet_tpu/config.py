"""Experiment config system.

The reference's YAML config layer (experiments/*.yaml) belongs to the
missing upstream CLIPSeg harness (ref: experiments/phrasecut.yaml:7-9
references experiment_setup.train_loop etc.; SURVEY.md §5.6).  This module
gives those configs a native home: a typed ``ClipSegExperiment`` dataclass,
a loader that understands the reference YAML schema (``configuration`` block
+ ``individual_configurations`` overrides), and a factory that builds the
matching CLIPDensePredT + optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class ClipSegExperiment:
    name: str = "default"
    version: str = "ViT-B/16"
    batch_size: int = 64
    lr: float = 1e-3
    t_max: int = 20000
    eta_min: float = 1e-4
    max_iterations: int = 20000
    image_size: int = 352
    reduce_dim: int = 64
    extract_layers: Tuple[int, ...] = (3, 7, 9)
    prompt: str = "shuffle+"
    negative_prob: float = 0.0
    complex_trans_conv: bool = False
    with_visual: bool = False
    mix: bool = False
    mix_text_max: float = 0.0
    mask: str = "text_and_crop_blur_highlight352"
    loss: str = "binary_cross_entropy_with_logits"
    amp: bool = True
    split: str = "train"
    normalize: bool = True


_YAML_KEYS = {
    "batch_size": "batch_size", "lr": "lr", "T_max": "t_max",
    "eta_min": "eta_min", "max_iterations": "max_iterations",
    "image_size": "image_size", "reduce_dim": "reduce_dim",
    "extract_layers": "extract_layers", "prompt": "prompt",
    "negative_prob": "negative_prob",
    "complex_trans_conv": "complex_trans_conv",
    "with_visual": "with_visual", "mix": "mix", "mix_text_max": "mix_text_max",
    "mask": "mask", "amp": "amp", "split": "split", "normalize": "normalize",
    "version": "version", "name": "name",
}


def _apply(cfg: ClipSegExperiment, d: dict) -> ClipSegExperiment:
    updates = {}
    for yk, field in _YAML_KEYS.items():
        if yk in d:
            v = d[yk]
            if field == "extract_layers":
                v = tuple(v)
            updates[field] = v
    return dataclasses.replace(cfg, **updates)


def load_experiments(path: str):
    """Parse a reference-format experiments YAML -> {name: ClipSegExperiment}.

    The shared ``configuration`` block seeds every run; each entry of
    ``individual_configurations`` overrides it (the schema used by
    experiments/phrasecut.yaml, incl. the rd64-uni / rd64-uni-refined runs).
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    base = _apply(ClipSegExperiment(), raw.get("configuration", {}))
    runs = {}
    for entry in raw.get("individual_configurations", []) or []:
        cfg = _apply(base, entry)
        runs[cfg.name] = cfg
    if not runs:
        runs[base.name] = base
    return runs


def build_from_experiment(cfg: ClipSegExperiment, dtype=None):
    """ClipSegExperiment -> (CLIPDensePredT module, create_state fn)."""
    import jax.numpy as jnp

    from egm_unet_tpu.engine.clipseg_train import create_clipseg_state
    from egm_unet_tpu.models.clip.model import VIT_B16, VIT_B32
    from egm_unet_tpu.models.clipseg import CLIPDensePredT

    clip_cfg = {"ViT-B/16": VIT_B16, "ViT-B/32": VIT_B32}[cfg.version]
    model = CLIPDensePredT(
        clip_cfg=clip_cfg,
        extract_layers=tuple(cfg.extract_layers),
        reduce_dim=cfg.reduce_dim,
        prompt=cfg.prompt,
        complex_trans_conv=cfg.complex_trans_conv,
        dtype=dtype or (jnp.bfloat16 if cfg.amp else jnp.float32),
    )

    def create_state(rng):
        return create_clipseg_state(
            model, rng, (cfg.batch_size, cfg.image_size, cfg.image_size, 3),
            lr=cfg.lr, t_max=cfg.t_max, eta_min=cfg.eta_min)

    return model, create_state
