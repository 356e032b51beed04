"""Config-driven encoder/decoder transformer blocks and stacks.

Semantics match reference models/base_blocks.py:
- ``SelfAttnBlockApi``   → :14-107 (block_style tokens in
  {'attn','rw_deform','deform','graph','deform_graph'}, combined via
  'concat' (linear merge) or 'onebyone' (two residual branches))
- ``CrossAttnBlockApi``  → :110-309 (independent style/combine for the
  self-attn and cross-attn halves; denoise visibility mask at :224-229)
- ``TransformerEncoder`` → :312-334 (precomputes one shared kNN idx)
- ``TransformerDecoder`` → :337-367
- ``PointTransformerEncoder/Decoder`` → :370-502 (stochastic-depth schedule)

``denoise_length`` is static; the mask is a compile-time constant.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import knn_point
from .layers import Attention, CrossAttention, DropPath, LayerScale, Mlp, dense
from .local_attention import (
    DeformableLocalAttention,
    DeformableLocalCrossAttention,
    DynamicGraphAttention,
    ImprovedDeformableLocalGraphAttention,
)

_LOCAL_TOKENS = ("rw_deform", "deform", "graph", "deform_graph")


def _make_local_attn(token: str, dim, num_heads, qkv_bias, attn_drop, drop, k, n_group, name):
    if token == "rw_deform":
        return DeformableLocalAttention(
            dim, num_heads=num_heads, qkv_bias=qkv_bias, attn_drop=attn_drop,
            proj_drop=drop, k=k, n_group=n_group, name=name,
        )
    if token == "deform":
        return DeformableLocalCrossAttention(
            dim, num_heads=num_heads, qkv_bias=qkv_bias, attn_drop=attn_drop,
            proj_drop=drop, k=k, n_group=n_group, name=name,
        )
    if token == "graph":
        return DynamicGraphAttention(dim, k=k, name=name)
    if token == "deform_graph":
        return ImprovedDeformableLocalGraphAttention(dim, k=k, name=name)
    raise ValueError(f"unexpected block token {token!r}")


def _parse_style(style: str, allowed=("attn",) + _LOCAL_TOKENS):
    tokens = style.split("-")
    assert 1 <= len(tokens) <= 2, f"invalid block style {style!r}"
    for t in tokens:
        assert t in allowed, f"unexpected block token {t!r}"
    has_attn = "attn" in tokens
    local = next((t for t in tokens if t != "attn"), None)
    return has_attn, local


def denoise_mask(query_len: int, denoise_length: int) -> Optional[jnp.ndarray]:
    """Boolean (N, N) mask, True = masked: real queries cannot attend to the
    trailing ``denoise_length`` denoise tokens (reference base_blocks.py:224-229)."""
    if denoise_length == 0:
        return None
    m = np.zeros((query_len, query_len), bool)
    m[:-denoise_length, -denoise_length:] = True
    return jnp.asarray(m)


class SelfAttnBlockApi(nn.Module):
    """Encoder block with configurable global/local attention mix."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    block_style: str = "attn-deform"
    combine_style: str = "concat"
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(self, x, pos, idx=None, deterministic: bool = True):
        assert self.combine_style in ("concat", "onebyone")
        has_attn, local_token = _parse_style(self.block_style)
        dp = lambda name: DropPath(self.drop_path, name=name)
        ls = lambda name: (
            LayerScale(self.dim, self.init_values, name=name)
            if self.init_values
            else (lambda y: y)
        )
        attn = (
            Attention(
                self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop, proj_drop=self.drop, name="attn",
            )
            if has_attn
            else None
        )
        local_attn = (
            _make_local_attn(
                local_token, self.dim, self.num_heads, self.qkv_bias,
                self.attn_drop, self.drop, self.k, self.n_group, "local_attn",
            )
            if local_token
            else None
        )

        def run_local(y):
            # every self-attn local variant (graph / deform / rw_deform /
            # deform_graph) takes the same (y, pos, idx) call — contrast
            # CrossAttnBlockApi.run_local_self, where denoise_length differs
            return local_attn(y, pos, idx=idx, deterministic=deterministic)

        if has_attn and local_token:
            if self.combine_style == "concat":
                norm_x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
                f = jnp.concatenate(
                    [
                        attn(norm_x, deterministic=deterministic),
                        run_local(norm_x),
                    ],
                    axis=-1,
                )
                f = dense(self.dim, name="merge_map")(f)
                x = x + dp("drop_path1")(ls("ls1")(f), deterministic)
            else:  # onebyone
                x = x + dp("drop_path1")(
                    ls("ls1")(
                        attn(
                            nn.LayerNorm(epsilon=1e-6, name="norm1")(x),
                            deterministic=deterministic,
                        )
                    ),
                    deterministic,
                )
                x = x + dp("drop_path3")(
                    ls("ls3")(run_local(nn.LayerNorm(epsilon=1e-6, name="norm3")(x))),
                    deterministic,
                )
        else:
            norm_x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            f = attn(norm_x, deterministic=deterministic) if attn else run_local(norm_x)
            x = x + dp("drop_path1")(ls("ls1")(f), deterministic)

        x = x + dp("drop_path2")(
            ls("ls2")(
                Mlp(
                    int(self.dim * self.mlp_ratio), self.dim, drop=self.drop, name="mlp"
                )(nn.LayerNorm(epsilon=1e-6, name="norm2")(x), deterministic)
            ),
            deterministic,
        )
        return x


class CrossAttnBlockApi(nn.Module):
    """Decoder block: configurable self-attn half + cross-attn half."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    self_attn_block_style: str = "attn-deform"
    self_attn_combine_style: str = "concat"
    cross_attn_block_style: str = "attn-deform"
    cross_attn_combine_style: str = "concat"
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(
        self,
        q,
        v,
        q_pos,
        v_pos,
        self_attn_idx=None,
        cross_attn_idx=None,
        denoise_length: int = 0,
        deterministic: bool = True,
    ):
        mask = denoise_mask(q.shape[1], denoise_length)
        dp = lambda name: DropPath(self.drop_path, name=name)
        ls = lambda name: (
            LayerScale(self.dim, self.init_values, name=name)
            if self.init_values
            else (lambda y: y)
        )

        # ---- self-attn half ----
        has_sa, sa_local_token = _parse_style(self.self_attn_block_style)
        self_attn = (
            Attention(
                self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop, proj_drop=self.drop, name="self_attn",
            )
            if has_sa
            else None
        )
        local_self_attn = (
            _make_local_attn(
                sa_local_token, self.dim, self.num_heads, self.qkv_bias,
                self.attn_drop, self.drop, self.k, self.n_group, "local_self_attn",
            )
            if sa_local_token
            else None
        )

        def run_local_self(y):
            if sa_local_token == "rw_deform":
                return local_self_attn(y, q_pos, idx=self_attn_idx, deterministic=deterministic)
            return local_self_attn(
                y, q_pos, idx=self_attn_idx, denoise_length=denoise_length,
                deterministic=deterministic,
            )

        if has_sa and sa_local_token:
            if self.self_attn_combine_style == "concat":
                norm_q = nn.LayerNorm(epsilon=1e-6, name="norm1")(q)
                f = jnp.concatenate(
                    [
                        self_attn(norm_q, mask=mask, deterministic=deterministic),
                        run_local_self(norm_q),
                    ],
                    axis=-1,
                )
                f = dense(self.dim, name="self_attn_merge_map")(f)
                q = q + dp("drop_path1")(ls("ls1")(f), deterministic)
            else:
                q = q + dp("drop_path1")(
                    ls("ls1")(
                        self_attn(
                            nn.LayerNorm(epsilon=1e-6, name="norm1")(q),
                            mask=mask, deterministic=deterministic,
                        )
                    ),
                    deterministic,
                )
                q = q + dp("drop_path3")(
                    ls("ls3")(
                        run_local_self(nn.LayerNorm(epsilon=1e-6, name="norm3")(q))
                    ),
                    deterministic,
                )
        else:
            norm_q = nn.LayerNorm(epsilon=1e-6, name="norm1")(q)
            f = (
                self_attn(norm_q, mask=mask, deterministic=deterministic)
                if self_attn
                else run_local_self(norm_q)
            )
            q = q + dp("drop_path1")(ls("ls1")(f), deterministic)

        # ---- cross-attn half ----
        has_ca, ca_local_token = _parse_style(
            self.cross_attn_block_style, allowed=("attn", "deform", "graph", "deform_graph")
        )
        cross_attn = (
            CrossAttention(
                self.dim, self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop, proj_drop=self.drop, name="cross_attn",
            )
            if has_ca
            else None
        )
        local_cross_attn = (
            _make_local_attn(
                ca_local_token, self.dim, self.num_heads, self.qkv_bias,
                self.attn_drop, self.drop, self.k, self.n_group, "local_cross_attn",
            )
            if ca_local_token
            else None
        )

        def run_local_cross(nq, nv):
            return local_cross_attn(
                nq, q_pos, v=nv, v_pos=v_pos, idx=cross_attn_idx,
                deterministic=deterministic,
            )

        if has_ca and ca_local_token:
            if self.cross_attn_combine_style == "concat":
                norm_q = nn.LayerNorm(epsilon=1e-6, name="norm_q")(q)
                norm_v = nn.LayerNorm(epsilon=1e-6, name="norm_v")(v)
                f = jnp.concatenate(
                    [
                        cross_attn(norm_q, norm_v, deterministic=deterministic),
                        run_local_cross(norm_q, norm_v),
                    ],
                    axis=-1,
                )
                f = dense(self.dim, name="cross_attn_merge_map")(f)
                q = q + dp("drop_path4")(ls("ls4")(f), deterministic)
            else:
                q = q + dp("drop_path4")(
                    ls("ls4")(
                        cross_attn(
                            nn.LayerNorm(epsilon=1e-6, name="norm_q")(q),
                            nn.LayerNorm(epsilon=1e-6, name="norm_v")(v),
                            deterministic=deterministic,
                        )
                    ),
                    deterministic,
                )
                q = q + dp("drop_path5")(
                    ls("ls5")(
                        run_local_cross(
                            nn.LayerNorm(epsilon=1e-6, name="norm_q_2")(q),
                            nn.LayerNorm(epsilon=1e-6, name="norm_v_2")(v),
                        )
                    ),
                    deterministic,
                )
        else:
            norm_q = nn.LayerNorm(epsilon=1e-6, name="norm_q")(q)
            norm_v = nn.LayerNorm(epsilon=1e-6, name="norm_v")(v)
            f = (
                cross_attn(norm_q, norm_v, deterministic=deterministic)
                if cross_attn
                else run_local_cross(norm_q, norm_v)
            )
            q = q + dp("drop_path4")(ls("ls4")(f), deterministic)

        q = q + dp("drop_path2")(
            ls("ls2")(
                Mlp(
                    int(self.dim * self.mlp_ratio), self.dim, drop=self.drop, name="mlp"
                )(nn.LayerNorm(epsilon=1e-6, name="norm2")(q), deterministic)
            ),
            deterministic,
        )
        return q


class PointTransformerEncoder(nn.Module):
    """Stack of SelfAttnBlockApi with one shared precomputed kNN idx
    (reference base_blocks.py:312-432, incl. the linspace stochastic-depth
    schedule at :400). NOTE: the reference defines a final ``self.norm``
    but its forward (base_blocks.py:429-431) never applies it — a dead
    parameter. Parity requires NOT normalising here (verified by the
    activation-parity harness, parity/run_parity.py)."""

    embed_dim: int = 256
    depth: int = 12
    num_heads: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    block_style_list: Sequence[str] = ("attn-deform",)
    combine_style: str = "concat"
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        assert len(self.block_style_list) == self.depth
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        idx = knn_point(self.k, pos, pos)
        for i in range(self.depth):
            x = SelfAttnBlockApi(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                init_values=self.init_values, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate, drop_path=float(dpr[i]),
                block_style=self.block_style_list[i],
                combine_style=self.combine_style, k=self.k, n_group=self.n_group,
                name=f"block{i}",
            )(x, pos, idx=idx, deterministic=deterministic)
        return x


class PointTransformerDecoder(nn.Module):
    """Stack of CrossAttnBlockApi; kNN idx precomputed per stack, the self-idx
    skipped in denoise mode (reference base_blocks.py:337-367, 435-502)."""

    embed_dim: int = 256
    depth: int = 12
    num_heads: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    self_attn_block_style_list: Sequence[str] = ("attn-deform",)
    self_attn_combine_style: str = "concat"
    cross_attn_block_style_list: Sequence[str] = ("attn-deform",)
    cross_attn_combine_style: str = "concat"
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(
        self, q, v, q_pos, v_pos, denoise_length: int = 0, deterministic: bool = True
    ):
        assert (
            len(self.self_attn_block_style_list)
            == len(self.cross_attn_block_style_list)
            == self.depth
        )
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        self_attn_idx = (
            knn_point(self.k, q_pos, q_pos) if denoise_length == 0 else None
        )
        cross_attn_idx = knn_point(self.k, v_pos, q_pos)
        for i in range(self.depth):
            q = CrossAttnBlockApi(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                init_values=self.init_values, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate, drop_path=float(dpr[i]),
                self_attn_block_style=self.self_attn_block_style_list[i],
                self_attn_combine_style=self.self_attn_combine_style,
                cross_attn_block_style=self.cross_attn_block_style_list[i],
                cross_attn_combine_style=self.cross_attn_combine_style,
                k=self.k, n_group=self.n_group, name=f"block{i}",
            )(
                q, v, q_pos, v_pos,
                self_attn_idx=self_attn_idx, cross_attn_idx=cross_attn_idx,
                denoise_length=denoise_length, deterministic=deterministic,
            )
        return q


def encoder_from_config(cfg, name="encoder") -> PointTransformerEncoder:
    """Build an encoder from an EasyDict-style config (PointTransformerEncoderEntry)."""
    return PointTransformerEncoder(
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=float(cfg.get("mlp_ratio", 4.0)),
        qkv_bias=bool(cfg.get("qkv_bias", True)),
        init_values=cfg.get("init_values", None),
        drop_rate=float(cfg.get("drop_rate", 0.0)),
        attn_drop_rate=float(cfg.get("attn_drop_rate", 0.0)),
        drop_path_rate=float(cfg.get("drop_path_rate", 0.0)),
        block_style_list=tuple(cfg.block_style_list),
        combine_style=cfg.get("combine_style", "concat"),
        k=int(cfg.get("k", 10)), n_group=int(cfg.get("n_group", 2)),
        name=name,
    )


def decoder_from_config(cfg, name="decoder") -> PointTransformerDecoder:
    """Build a decoder from an EasyDict-style config (PointTransformerDecoderEntry)."""
    return PointTransformerDecoder(
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=float(cfg.get("mlp_ratio", 4.0)),
        qkv_bias=bool(cfg.get("qkv_bias", True)),
        init_values=cfg.get("init_values", None),
        drop_rate=float(cfg.get("drop_rate", 0.0)),
        attn_drop_rate=float(cfg.get("attn_drop_rate", 0.0)),
        drop_path_rate=float(cfg.get("drop_path_rate", 0.0)),
        self_attn_block_style_list=tuple(cfg.self_attn_block_style_list),
        self_attn_combine_style=cfg.get("self_attn_combine_style", "concat"),
        cross_attn_block_style_list=tuple(cfg.cross_attn_block_style_list),
        cross_attn_combine_style=cfg.get("cross_attn_combine_style", "concat"),
        k=int(cfg.get("k", 10)), n_group=int(cfg.get("n_group", 2)),
        name=name,
    )
