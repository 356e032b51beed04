"""Cross-modal fusion stacks (image / segmentation features → point tokens).

Reference models/internal/pctransformer.py:114-136 (layer definitions) and
:148-199 / :237-326 (application): five post-norm residual attention layers —
cross(x, mem) → self(x) → [skip] → cross(x, mem) → self(x) → cross(x, skip) —
built from torch nn.MultiheadAttention(dim, 8). Here each MHA maps to the
equivalent q/k/v-projected attention with bias (torch MHA default).

One fusion module instance is shared between the encoder-side and
decoder-side application sites, matching the reference's single
``cross_attn_seg*`` layer set.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Attention, CrossAttention


class AttentionFusion(nn.Module):
    """cross1 → self1 → (skip) → cross2 → self2 → cross(skip), post-LN residual."""

    dim: int
    num_heads: int = 8

    def setup(self):
        d, h = self.dim, self.num_heads
        self.cross1 = CrossAttention(d, d, num_heads=h, qkv_bias=True)
        self.self1 = Attention(d, num_heads=h, qkv_bias=True)
        self.cross2 = CrossAttention(d, d, num_heads=h, qkv_bias=True)
        self.self2 = Attention(d, num_heads=h, qkv_bias=True)
        self.cross3 = CrossAttention(d, d, num_heads=h, qkv_bias=True)
        self.ln1 = nn.LayerNorm(epsilon=1e-5)
        self.ln2 = nn.LayerNorm(epsilon=1e-5)
        self.ln3 = nn.LayerNorm(epsilon=1e-5)
        self.ln4 = nn.LayerNorm(epsilon=1e-5)
        self.ln5 = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, x, mem, deterministic: bool = True):
        x = self.ln1(self.cross1(x, mem, deterministic=deterministic) + x)
        x = self.ln2(self.self1(x, deterministic=deterministic) + x)
        skip = x
        x = self.ln3(self.cross2(x, mem, deterministic=deterministic) + x)
        x = self.ln4(self.self2(x, deterministic=deterministic) + x)
        x = self.ln5(self.cross3(x, skip, deterministic=deterministic) + x)
        return x


class ImgFusion(nn.Module):
    """Image-branch fusion (reference pctransformer.py:148-172): project the
    ResNet18 patch grid (B, 256, 196) → (B, 256, dim), then AttentionFusion."""

    dim: int
    num_heads: int = 8

    def setup(self):
        self.proj = nn.Dense(self.dim)  # get_better_img_size: Linear(196→384)
        self.fusion = AttentionFusion(self.dim, self.num_heads)

    def __call__(self, x, img_feat, deterministic: bool = True):
        mem = nn.gelu(self.proj(img_feat), approximate=False)
        return self.fusion(x, mem, deterministic=deterministic)


class SegFusion(nn.Module):
    """Segmentation-branch fusion (reference pctransformer.py:175-199):
    project frozen GDANet per-point features (B, n, 128) → (B, n, dim),
    then AttentionFusion."""

    dim: int
    num_heads: int = 8

    def setup(self):
        self.proj = nn.Dense(self.dim)  # get_better_seg_size: Linear(128→384)
        self.fusion = AttentionFusion(self.dim, self.num_heads)

    def __call__(self, x, seg_feat, deterministic: bool = True):
        mem = nn.gelu(self.proj(seg_feat), approximate=False)
        return self.fusion(x, mem, deterministic=deterministic)
