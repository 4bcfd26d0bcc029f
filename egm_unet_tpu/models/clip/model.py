"""CLIP (Long-CLIP + CSA) in flax/NHWC — TPU rebuild of the reference's
``clip/model.py``.

Differences from a straight port:
- attention is the framework-wide ``ops.attention.multi_head_attention``
  (einsum-based, MXU-native, bf16-safe softmax in fp32);
- activations are [B, S, D] (no LND permutes);
- the dense/segmentation forward (``visual_forward_dense``) extracts
  per-layer activations functionally instead of re-implementing the block
  (ref: models/clipseg.py:79-133 forward_multihead_attention).

LayerNorm is computed in fp32 regardless of the compute dtype (the reference
subclasses LayerNorm for fp16 safety, ref: clip/model.py:159).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from egm_unet_tpu.ops.attention import multi_head_attention
from egm_unet_tpu.ops.resize import resize_bicubic

KEEP_LEN = 20  # Long-CLIP keeps the first 20 positions verbatim


def resolve_attn_impl(impl: Optional[str]) -> str:
    """Resolve 'auto' to 'pallas' (TPU) or 'xla' at *trace time*.

    The platform is taken from the active concrete mesh when one is set
    (``jax.set_mesh``), so tracing under a TPU mesh from a CPU host picks the
    right kernel; otherwise it falls back to ``jax.default_backend()``.
    Remaining limit: AOT lowering for TPU *without* a mesh on a CPU-default
    host still resolves to 'xla' — pass ``attn_impl='pallas'`` explicitly
    there."""
    if impl not in (None, "auto"):
        return impl
    try:
        from jax._src.mesh import get_concrete_mesh

        mesh = get_concrete_mesh()
        if mesh is not None and getattr(mesh, "devices", None) is not None \
                and mesh.devices.size:
            return "pallas" if mesh.devices.flat[0].platform == "tpu" else "xla"
    except Exception:
        pass
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    context_length: int = 248  # Long-CLIP default (ref: clip/model.py:375)
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    long_clip: bool = True  # dual positional embeddings

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64


VIT_B16 = CLIPConfig()
VIT_B32 = dataclasses.replace(VIT_B16, vision_patch_size=32)


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 (ref: clip/model.py:159-166)."""

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           param_dtype=jnp.float32)(x.astype(jnp.float32))
        return out.astype(orig)


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (ref: clip/model.py:173-207).

    ``attn_impl='pallas'`` routes CSA attention through the fused Pallas
    kernel (ops/pallas/csa.py) — TPU only; 'xla' is the einsum path;
    'auto' (default) picks pallas on TPU backends (measured +58% on the
    352px CLIPSeg forward: 1331 vs 842 img/s, PERF.md) and xla elsewhere."""

    width: int
    heads: int
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, attn_bias=None, csa: bool = False,
                 return_weights: bool = False, mult_mask=None):
        h = LayerNormF32(name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                       name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        impl = resolve_attn_impl(self.attn_impl)
        if csa and impl == "pallas" and not return_weights and mult_mask is None:
            from egm_unet_tpu.ops.pallas.csa import csa_attention

            attn = csa_attention(q, k, v, self.heads)
        else:
            attn = multi_head_attention(q, k, v, self.heads, csa=csa,
                                        attn_bias=attn_bias, mult_mask=mult_mask,
                                        return_weights=return_weights)
        if return_weights:
            attn, weights = attn
        attn = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(attn)
        x = x + attn
        h = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="c_fc")(h)
        h = QuickGELU()(h)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="c_proj")(h)
        x = x + h
        if return_weights:
            return x, weights
        return x


class VisionTransformer(nn.Module):
    """ViT with CSA on the last block (encode path, ref: clip/model.py:209-261)
    or on all blocks (dense path, ref: models/clipseg.py:188-256)."""

    cfg: CLIPConfig
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    def _pos_embedding(self, pos, n_tokens: int, grid_hw: Tuple[int, int]):
        """Bicubic-resample patch positions for non-224 inputs
        (ref: clip/model.py:263-281, models/clipseg.py:181-186)."""
        n = pos.shape[0] - 1
        if n_tokens == n:
            return pos
        side = int(math.sqrt(n))
        cls_pos, patch_pos = pos[:1], pos[1:]
        grid = patch_pos.reshape(side, side, -1)
        grid = resize_bicubic(grid, grid_hw, align_corners=False)
        return jnp.concatenate([cls_pos, grid.reshape(-1, pos.shape[-1])], axis=0)

    @nn.compact
    def __call__(
        self,
        x,  # NHWC image
        *,
        csa: bool = True,
        extract_layers: Sequence[int] = (),
        return_all: bool = False,
        dense: bool = False,
        mask=None,  # (mask_type, seg[B, h, w]) visual-prompt attention mask
        return_affinities: bool = False,  # also collect per-layer attn maps
    ):
        cfg = self.cfg
        p = cfg.vision_patch_size
        b, h, w, _ = x.shape
        grid_hw = (h // p, w // p)

        patches = nn.Conv(cfg.vision_width, (p, p), strides=(p, p), use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        tokens = patches.reshape(b, grid_hw[0] * grid_hw[1], cfg.vision_width)

        cls = self.param("class_embedding", nn.initializers.normal(cfg.vision_width**-0.5),
                         (cfg.vision_width,), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, cfg.vision_width)), tokens],
            axis=1)

        n_pos = (cfg.image_resolution // p) ** 2 + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(cfg.vision_width**-0.5),
                         (n_pos, cfg.vision_width), jnp.float32)
        pos_used = self._pos_embedding(pos, tokens.shape[1] - 1, grid_hw)
        tokens = tokens + pos_used.astype(tokens.dtype)[None]

        tokens = LayerNormF32(name="ln_pre")(tokens)

        mult_mask = None
        if mask is not None:
            # resize the visual-prompt seg to the patch grid (NEAREST — torch
            # F.interpolate default) and flatten (ref: models/clipseg.py:222-233)
            from egm_unet_tpu.ops.resize import resize_nearest

            mask_type, seg = mask
            seg = resize_nearest(seg.astype(jnp.float32)[..., None], grid_hw,
                                 mode="torch")
            mult_mask = (mask_type, seg.reshape(b, grid_hw[0] * grid_hw[1]))

        activations, affinities = [], []
        n_layers = cfg.vision_layers
        for i in range(n_layers):
            block = ResidualAttentionBlock(cfg.vision_width, cfg.vision_heads,
                                           self.dtype, attn_impl=self.attn_impl,
                                           name=f"resblock{i}")
            # dense path: CSA in every block (ref: models/clipseg.py:236);
            # encode path: CSA only in the final block (ref: clip/model.py:247-251)
            use_csa = csa and (dense or i == n_layers - 1)
            want_aff = return_affinities and i in extract_layers
            out = block(tokens, csa=use_csa, mult_mask=mult_mask,
                        return_weights=want_aff)
            if want_aff:
                tokens, aff = out
                affinities.append(aff)  # [B, heads, S, S] per-head attention
            else:
                tokens = out
            if i in extract_layers:
                activations.append(tokens)

        pooled = LayerNormF32(name="ln_post")(
            tokens if return_all else tokens[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(cfg.vision_width**-0.5),
                          (cfg.vision_width, cfg.embed_dim), jnp.float32)
        pooled = (pooled.astype(jnp.float32) @ proj).astype(tokens.dtype)

        if extract_layers and return_affinities:
            return pooled, activations, affinities
        if extract_layers:
            return pooled, activations
        return pooled


def get_attn(clip_module: "CLIP", variables, image, layer: str = "final",
             csa: bool = True):
    """Attention-map visualization helper (ref: clip/model.py:315-355):
    'final' returns the last block's (optionally CSA) attention; 'all'
    returns every layer's."""
    cfg = clip_module.cfg
    layers = ([cfg.vision_layers - 1] if layer == "final"
              else list(range(cfg.vision_layers)))
    if layer not in ("final", "all"):
        raise ValueError("layer should be final or all")
    # both modes run standard attention in blocks[:-1] and (optionally) CSA
    # only in the last block — the encode-path convention
    # (ref: clip/model.py:334-353)
    _, _, affinities = clip_module.apply(
        variables,
        image,
        csa=csa,
        dense=False,
        extract_layers=layers,
        return_affinities=True,
        method=lambda m, *a, **k: m.visual(*a, **k),
    )
    return affinities if layer == "all" else affinities[0]


class CLIP(nn.Module):
    """Dual-tower CLIP with Long-CLIP text side (dual positional embeddings,
    ref: clip/model.py:406-431,487-501)."""

    cfg: CLIPConfig = VIT_B16
    dtype: Any = jnp.float32
    attn_impl: str = "auto"  # 'pallas' fuses CSA attention on TPU

    def setup(self):
        cfg = self.cfg
        if isinstance(cfg.vision_layers, (tuple, list)):
            # RN checkpoints ("RN50"...) carry a tuple of per-stage block
            # counts; the reference's build does the same dispatch
            # (ref: clip/model.py:436-449)
            from egm_unet_tpu.models.clip.resnet import ModifiedResNet

            self.visual = ModifiedResNet(
                layers=tuple(cfg.vision_layers), output_dim=cfg.embed_dim,
                heads=cfg.vision_width * 32 // 64,
                input_resolution=cfg.image_resolution, width=cfg.vision_width,
                dtype=self.dtype, name="visual")
        else:
            self.visual = VisionTransformer(cfg, self.dtype,
                                            attn_impl=self.attn_impl,
                                            name="visual")
        self.token_embedding = nn.Embed(cfg.vocab_size, cfg.transformer_width,
                                        embedding_init=nn.initializers.normal(0.02),
                                        param_dtype=jnp.float32,
                                        name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.transformer_width), jnp.float32)
        if cfg.long_clip:
            self.positional_embedding_res = self.param(
                "positional_embedding_res", nn.initializers.normal(0.01),
                (cfg.context_length, cfg.transformer_width), jnp.float32)
        self.text_blocks = [
            ResidualAttentionBlock(cfg.transformer_width, cfg.transformer_heads,
                                   self.dtype, name=f"text_resblock{i}")
            for i in range(cfg.transformer_layers)
        ]
        self.ln_final = LayerNormF32(name="ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.transformer_width**-0.5),
            (cfg.transformer_width, cfg.embed_dim), jnp.float32)
        self.logit_scale = self.param(
            "logit_scale", lambda *_: jnp.asarray(np.log(1 / 0.07), jnp.float32), ())

    def _text_pos(self):
        if not self.cfg.long_clip:
            return self.positional_embedding
        n = self.cfg.context_length
        mask1 = (jnp.arange(n) < KEEP_LEN)[:, None]
        return jnp.where(mask1, self.positional_embedding, self.positional_embedding_res)

    def _causal_bias(self):
        n = self.cfg.context_length
        return jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)

    def encode_text(self, text, pool: bool = True):
        """ref: clip/model.py:487-516 (encode_text / encode_text_full)."""
        x = self.token_embedding(text.astype(jnp.int32)).astype(self.dtype)
        x = x + self._text_pos().astype(self.dtype)[None]
        bias = self._causal_bias()
        for block in self.text_blocks:
            x = block(x, attn_bias=bias)
        x = self.ln_final(x)
        if not pool:
            return x
        eot = jnp.argmax(text, axis=-1)  # EOT has the highest token id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return (pooled.astype(jnp.float32) @ self.text_projection).astype(self.dtype)

    def encode_image(self, image, csa: bool = True, return_all: bool = False):
        return self.visual(image, csa=csa, return_all=return_all)

    def visual_forward_dense(self, image, extract_layers: Sequence[int]):
        """Dense ViT pass with per-layer activation extraction and CSA in all
        blocks — the CLIPSeg encoder contract (ref: models/clipseg.py:188-256)."""
        if isinstance(self.cfg.vision_layers, (tuple, list)):
            raise ValueError("dense extraction requires a ViT tower; the "
                             "ModifiedResNet tower has no CSA/dense path "
                             "(ref: models/clipseg.py is ViT-only)")
        return self.visual(image, csa=True, dense=True, extract_layers=extract_layers)

    def __call__(self, image, text):
        """Contrastive logits (ref: clip/model.py:540-560 inference shape)."""
        img = self.encode_image(image)
        txt = self.encode_text(text)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def stretch_positional_embedding(pe: np.ndarray, keep_len: int = KEEP_LEN) -> np.ndarray:
    """Long-CLIP knowledge-preserving stretch 77 -> 4*77-3*keep_len == 248:
    keep the first ``keep_len`` positions, 4x linear-interpolate the rest,
    linearly extrapolate the tail (ref: clip/clip.py:230-251)."""
    length, dim = pe.shape
    out = np.zeros((4 * length - 3 * keep_len, dim), pe.dtype)
    out[:keep_len] = pe[:keep_len]
    for i in range(length - 1 - keep_len):
        out[4 * i + keep_len] = pe[i + keep_len]
        out[4 * i + 1 + keep_len] = 3 * pe[i + keep_len] / 4 + pe[i + 1 + keep_len] / 4
        out[4 * i + 2 + keep_len] = 2 * pe[i + keep_len] / 4 + 2 * pe[i + 1 + keep_len] / 4
        out[4 * i + 3 + keep_len] = pe[i + keep_len] / 4 + 3 * pe[i + 1 + keep_len] / 4
    d = pe[length - 1] - pe[length - 2]
    base = 4 * length - 3 * keep_len
    for j in range(4):
        out[base - 4 + j] = pe[length - 1] + j * d / 4
    return out
