"""Fixed-style legacy encoder/decoder blocks.

Reference models/Transformer_utils.py:873-1045 — kept for API parity (the
registered models all use the configurable SelfAttn/CrossAttnBlockApi
instead, but these remain part of the reference's public surface and its
ablation history).
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from .layers import Attention, CrossAttention, DropPath, LayerScale, Mlp
from .local_attention import (
    DeformableLocalAttention,
    DeformableLocalCrossAttention,
    DynamicGraphAttention,
)


class _ResidualPair(nn.Module):
    """attn-branch + mlp-branch with pre-LN residuals (shared skeleton)."""

    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0

    def scaled(self, name, x, deterministic):
        if self.init_values:
            x = LayerScale(self.dim, self.init_values, name=f"ls_{name}")(x)
        return DropPath(self.drop_path, name=f"dp_{name}")(x, deterministic)

    def mlp_branch(self, x, deterministic):
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, drop=self.drop, name="mlp")(
            y, deterministic
        )
        return x + self.scaled("mlp", y, deterministic)


class Block(_ResidualPair):
    """Plain self-attention block (reference :873-894)."""

    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        y = Attention(self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), deterministic=deterministic
        )
        x = x + self.scaled("attn", y, deterministic)
        return self.mlp_branch(x, deterministic)


class RegionWiseBlock(_ResidualPair):
    """Deformable region-wise (maxpool) block (reference :896-917)."""

    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        y = DeformableLocalAttention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="deformable_attn"
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x), pos, deterministic=deterministic)
        x = x + self.scaled("attn", y, deterministic)
        return self.mlp_branch(x, deterministic)


class DeformableAttnBlock(_ResidualPair):
    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        y = DeformableLocalCrossAttention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="deformable_attn"
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x), pos, deterministic=deterministic)
        x = x + self.scaled("attn", y, deterministic)
        return self.mlp_branch(x, deterministic)


class GraphConvBlock(_ResidualPair):
    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        y = DynamicGraphAttention(self.dim, name="graphattn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), pos
        )
        x = x + self.scaled("attn", y, deterministic)
        return self.mlp_branch(x, deterministic)


class DecoderBlock(_ResidualPair):
    """self-attn → cross-attn → mlp (reference :961-988)."""

    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, q, v, q_pos, v_pos, deterministic: bool = True):
        y = Attention(self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(q), deterministic=deterministic
        )
        q = q + self.scaled("self", y, deterministic)
        y = CrossAttention(
            self.dim, self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="attn"
        )(
            nn.LayerNorm(epsilon=1e-5, name="norm_q")(q),
            nn.LayerNorm(epsilon=1e-5, name="norm_v")(v),
            deterministic=deterministic,
        )
        q = q + self.scaled("cross", y, deterministic)
        return self.mlp_branch(q, deterministic)


class DeformableAttnDecoderBlock(_ResidualPair):
    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, q, v, q_pos, v_pos, deterministic: bool = True):
        y = Attention(self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(q), deterministic=deterministic
        )
        q = q + self.scaled("self", y, deterministic)
        y = DeformableLocalCrossAttention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="attn"
        )(
            nn.LayerNorm(epsilon=1e-5, name="norm_q")(q), q_pos,
            v=nn.LayerNorm(epsilon=1e-5, name="norm_v")(v), v_pos=v_pos,
            deterministic=deterministic,
        )
        q = q + self.scaled("cross", y, deterministic)
        return self.mlp_branch(q, deterministic)


class GraphConvDecoderBlock(_ResidualPair):
    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, q, v, q_pos, v_pos, deterministic: bool = True):
        y = Attention(self.dim, self.num_heads, qkv_bias=self.qkv_bias, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(q), deterministic=deterministic
        )
        q = q + self.scaled("self", y, deterministic)
        y = DynamicGraphAttention(self.dim, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm_q")(q), q_pos,
            v=nn.LayerNorm(epsilon=1e-5, name="norm_v")(v), v_pos=v_pos,
        )
        q = q + self.scaled("cross", y, deterministic)
        return self.mlp_branch(q, deterministic)
