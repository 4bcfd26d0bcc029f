"""Checkpoint converters: PyTorch state dicts -> flax param trees.

Covers the reference's three checkpoint families (SURVEY.md §7.3/§7.5):
- CLIP / Long-CLIP towers (``longclip-B.pt`` or OpenAI ``ViT-B/16``),
  ref loader: clip/clip.py:46-75,136-255;
- CLIPSeg decoder (``rd64-uni.pth``, loaded strict=False over the frozen
  tower, ref: eval_CLIPseg.py:810);
- GRFB/EGM-UNet ``.pth`` dicts saved by train.py (ref: train.py:152-156).

torch is only imported inside the functions (the framework itself never
depends on it at run time).

Layout maps: Linear weight [out,in] -> kernel [in,out] (transpose);
Conv2d OIHW -> HWIO; ConvTranspose2d (in,out,kh,kw) -> (in,kh,kw,out).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv_oihw(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def layernorm(sd, prefix):
    return {"LayerNorm_0": {"scale": _t(sd[f"{prefix}.weight"]),
                            "bias": _t(sd[f"{prefix}.bias"])}}


def _resblock(sd, prefix):
    in_proj = {"kernel": _t(sd[f"{prefix}.attn.in_proj_weight"]).T,
               "bias": _t(sd[f"{prefix}.attn.in_proj_bias"])}
    return {
        "ln_1": layernorm(sd, f"{prefix}.ln_1"),
        "ln_2": layernorm(sd, f"{prefix}.ln_2"),
        "in_proj": in_proj,
        "out_proj": linear(sd, f"{prefix}.attn.out_proj"),
        "c_fc": linear(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": linear(sd, f"{prefix}.mlp.c_proj"),
    }


def infer_clip_config(sd) -> dict:
    """Shape-inferring factory, mirroring build_model
    (ref: clip/model.py:654-690).  ``visual.proj`` present -> ViT tower;
    otherwise the ModifiedResNet config tuple (ref: clip/model.py:663-670)."""
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len([k for k in sd
                             if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        vision_layers = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4))
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_w = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_patch_size = 0
        image_resolution = out_w * 32
    return dict(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks")}),
        long_clip="positional_embedding_res" in sd,
    )


def _inference_bn(sd, prefix):
    """torch BatchNorm2d buffers -> InferenceBatchNorm params
    (models/clip/resnet.py)."""
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"]),
            "mean": _t(sd[f"{prefix}.running_mean"]),
            "var": _t(sd[f"{prefix}.running_var"])}


def _rn_visual(sd, stage_blocks) -> dict:
    """ModifiedResNet tower state dict -> params (ref: clip/model.py:106-157
    module names; flax names per models/clip/resnet.py)."""
    visual = {}
    for i in (1, 2, 3):
        visual[f"stem_conv{i}"] = conv_oihw(sd, f"visual.conv{i}")
        visual[f"stem_bn{i}"] = _inference_bn(sd, f"visual.bn{i}")
    for stage, blocks in enumerate(stage_blocks, start=1):
        for b in range(blocks):
            p = f"visual.layer{stage}.{b}"
            blk = {f"conv{j}": conv_oihw(sd, f"{p}.conv{j}") for j in (1, 2, 3)}
            blk.update({f"bn{j}": _inference_bn(sd, f"{p}.bn{j}") for j in (1, 2, 3)})
            if f"{p}.downsample.0.weight" in sd:
                blk["ds_conv"] = conv_oihw(sd, f"{p}.downsample.0")
                blk["ds_bn"] = _inference_bn(sd, f"{p}.downsample.1")
            visual[f"layer{stage}_{b}"] = blk
    visual["attnpool"] = {
        "positional_embedding": _t(sd["visual.attnpool.positional_embedding"]),
        "q_proj": linear(sd, "visual.attnpool.q_proj"),
        "k_proj": linear(sd, "visual.attnpool.k_proj"),
        "v_proj": linear(sd, "visual.attnpool.v_proj"),
        "c_proj": linear(sd, "visual.attnpool.c_proj"),
    }
    return visual


def clip_from_torch(sd: Dict[str, "np.ndarray"], n_vision_layers,
                    n_text_layers: int) -> dict:
    """Torch CLIP state dict -> params for models.clip.model.CLIP.
    ``n_vision_layers``: int (ViT depth) or tuple (RN per-stage blocks)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if isinstance(n_vision_layers, (tuple, list)):
        visual = _rn_visual(sd, tuple(n_vision_layers))
    else:
        visual = {
            "conv1": conv_oihw(sd, "visual.conv1"),
            "class_embedding": _t(sd["visual.class_embedding"]),
            "positional_embedding": _t(sd["visual.positional_embedding"]),
            "ln_pre": layernorm(sd, "visual.ln_pre"),
            "ln_post": layernorm(sd, "visual.ln_post"),
            "proj": _t(sd["visual.proj"]),
        }
        for i in range(n_vision_layers):
            visual[f"resblock{i}"] = _resblock(sd, f"visual.transformer.resblocks.{i}")

    params = {
        "visual": visual,
        "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": layernorm(sd, "ln_final"),
        "text_projection": _t(sd["text_projection"]),
        "logit_scale": _t(sd["logit_scale"]),
    }
    if "positional_embedding_res" in sd:
        params["positional_embedding_res"] = _t(sd["positional_embedding_res"])
    for i in range(n_text_layers):
        params[f"text_resblock{i}"] = _resblock(sd, f"transformer.resblocks.{i}")
    return params


def load_clip_checkpoint(path: str, stretch_to_long: bool = False):
    """Load a torch CLIP/Long-CLIP checkpoint file -> (CLIPConfig kwargs,
    params).  With ``stretch_to_long`` an OpenAI 77-ctx checkpoint gets the
    Long-CLIP positional stretch applied (ref: clip/clip.py:230-251)."""
    import torch

    from egm_unet_tpu.models.clip.model import stretch_positional_embedding

    with open(path, "rb") as f:
        try:
            sd = torch.jit.load(f, map_location="cpu").eval().state_dict()
        except RuntimeError:
            f.seek(0)
            sd = torch.load(f, map_location="cpu", weights_only=False)
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    cfg = infer_clip_config(sd)
    if stretch_to_long and not cfg["long_clip"]:
        pe = stretch_positional_embedding(sd["positional_embedding"])
        sd["positional_embedding"] = pe
        sd["positional_embedding_res"] = pe.copy()
        cfg["context_length"] = pe.shape[0]
        cfg["long_clip"] = True
    params = clip_from_torch(sd, cfg["vision_layers"], cfg["transformer_layers"])
    return cfg, params


def _torch_encoder_layer(sd, prefix):
    return {
        "in_proj": {"kernel": _t(sd[f"{prefix}.self_attn.in_proj_weight"]).T,
                    "bias": _t(sd[f"{prefix}.self_attn.in_proj_bias"])},
        "out_proj": linear(sd, f"{prefix}.self_attn.out_proj"),
        "linear1": linear(sd, f"{prefix}.linear1"),
        "linear2": linear(sd, f"{prefix}.linear2"),
        "norm1": {"scale": _t(sd[f"{prefix}.norm1.weight"]),
                  "bias": _t(sd[f"{prefix}.norm1.bias"])},
        "norm2": {"scale": _t(sd[f"{prefix}.norm2.weight"]),
                  "bias": _t(sd[f"{prefix}.norm2.bias"])},
    }


def clipseg_decoder_from_torch(sd, depth: int = 3) -> dict:
    """rd64-uni.pth decoder weights -> CLIPDensePredT params (partial tree;
    merge over the initialized model like the reference's strict=False
    load, ref: eval_CLIPseg.py:810)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "film_mul": linear(sd, "film_mul"),
        "film_add": linear(sd, "film_add"),
    }
    for i in range(depth):
        params[f"reduce{i}"] = linear(sd, f"reduces.{i}")
        params[f"block{i}"] = _torch_encoder_layer(sd, f"blocks.{i}")
    if "trans_conv.weight" in sd:  # (in, out, kh, kw) -> (in, kh, kw, out)
        params["trans_conv_kernel"] = _t(sd["trans_conv.weight"]).transpose(0, 2, 3, 1)
        params["trans_conv_bias"] = _t(sd["trans_conv.bias"])
    return params


def merge_params(base: dict, override: dict) -> dict:
    """strict=False-style recursive merge of a partial param tree."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
