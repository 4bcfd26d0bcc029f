"""Tiny-but-faithful torch CLIP oracle (test-only).

Implements the reference CLIP semantics from SURVEY.md §2.6/§2.8 — pre-LN
blocks with QuickGELU, causal text mask, Long-CLIP dual positional
embeddings with the <20/>=20 masks, CSA attention in the last visual block
(encode path) or all blocks (dense path) — with parameter names laid out so
``state_dict()`` matches the upstream checkpoint key schema that
``egm_unet_tpu.utils.convert`` consumes.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Attn(nn.Module):
    """MHA holding in_proj_weight/in_proj_bias/out_proj like torch's MHA."""

    def __init__(self, d, heads):
        super().__init__()
        self.num_heads = heads
        self.in_proj_weight = nn.Parameter(torch.randn(3 * d, d) * d**-0.5)
        self.in_proj_bias = nn.Parameter(torch.randn(3 * d) * 0.02)
        self.out_proj = nn.Linear(d, d)

    def project(self, x):
        q, k, v = F.linear(x, self.in_proj_weight, self.in_proj_bias).chunk(3, dim=-1)
        return q, k, v

    def forward(self, x, attn_mask=None, csa=False):
        # x: [B, S, D]
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        scale = hd**-0.5
        q, k, v = self.project(x)

        def split(t):
            return t.view(b, s, h, hd).transpose(1, 2)  # [B,h,S,hd]

        q, k, v = split(q), split(k), split(v)
        if csa:
            qa = torch.softmax(q @ q.transpose(-1, -2) * scale, dim=-1)
            ka = torch.softmax(k @ k.transpose(-1, -2) * scale, dim=-1)
            w = qa + ka
        else:
            logits = q @ k.transpose(-1, -2) * scale
            if attn_mask is not None:
                logits = logits + attn_mask
            w = torch.softmax(logits, dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, s, d)
        return self.out_proj(out)


class MLP(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.c_fc = nn.Linear(d, 4 * d)
        self.c_proj = nn.Linear(4 * d, d)

    def forward(self, x):
        h = self.c_fc(x)
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return self.c_proj(h)


class Block(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = Attn(d, heads)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = MLP(d)

    def forward(self, x, attn_mask=None, csa=False):
        x = x + self.attn(self.ln_1(x), attn_mask, csa)
        x = x + self.mlp(self.ln_2(x))
        return x


class _Resblocks(nn.Module):
    def __init__(self, d, heads, layers):
        super().__init__()
        self.resblocks = nn.ModuleList([Block(d, heads) for _ in range(layers)])


class _VisualTransformer(nn.Module):
    def __init__(self, width, heads, layers):
        super().__init__()
        self.transformer = _Resblocks(width, heads, layers)


class Visual(nn.Module):
    def __init__(self, width, patch, layers, heads, embed_dim, resolution):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(width) * width**-0.5)
        n = (resolution // patch) ** 2 + 1
        self.positional_embedding = nn.Parameter(torch.randn(n, width) * width**-0.5)
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = _Resblocks(width, heads, layers)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.randn(width, embed_dim) * width**-0.5)

    def tokens(self, x):
        x = self.conv1(x)  # [B, W, g, g]
        x = x.flatten(2).transpose(1, 2)  # [B, g*g, W]
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        return x + self.positional_embedding[None]

    def forward(self, x, csa=True):
        """encode path: standard blocks, CSA only in the last
        (ref: clip/model.py:246-261)."""
        x = self.ln_pre(self.tokens(x))
        blocks = self.transformer.resblocks
        for blk in blocks[:-1]:
            x = blk(x)
        x = blocks[-1](x, csa=csa)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj

    def forward_dense(self, x, extract_layers):
        """dense path: CSA everywhere, collect activations
        (ref: models/clipseg.py:188-256)."""
        x = self.ln_pre(self.tokens(x))
        acts = []
        for i, blk in enumerate(self.transformer.resblocks):
            x = blk(x, csa=True)
            if i in extract_layers:
                acts.append(x)
        pooled = self.ln_post(x[:, 0, :]) @ self.proj
        return pooled, acts


class TinyCLIP(nn.Module):
    def __init__(self, embed_dim=32, resolution=32, vision_layers=3,
                 vision_width=64, patch=16, context_length=24, vocab=512,
                 width=64, heads=2, layers=3, long_clip=True, keep_len=20):
        super().__init__()
        self.context_length = context_length
        self.keep_len = keep_len
        self.long_clip = long_clip
        self.visual = Visual(vision_width, patch, vision_layers,
                             vision_width // 64 or 1, embed_dim, resolution)
        self.transformer = _Resblocks(width, heads, layers)
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.randn(context_length, width) * 0.01)
        if long_clip:
            self.positional_embedding_res = nn.Parameter(
                torch.randn(context_length, width) * 0.01)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.randn(width, embed_dim) * width**-0.5)
        self.logit_scale = nn.Parameter(torch.ones([]) * math.log(1 / 0.07))

    def encode_text(self, text):
        x = self.token_embedding(text)
        if self.long_clip:
            n = self.context_length
            mask1 = (torch.arange(n) < self.keep_len).float()[:, None]
            pos = self.positional_embedding * mask1 + self.positional_embedding_res * (1 - mask1)
        else:
            pos = self.positional_embedding
        x = x + pos[None]
        n = x.shape[1]
        causal = torch.full((n, n), float("-inf")).triu(1)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=causal)
        x = self.ln_final(x)
        eot = text.argmax(dim=-1)
        pooled = x[torch.arange(x.shape[0]), eot]
        return pooled @ self.text_projection

    def encode_image(self, image):
        return self.visual(image, csa=True)
