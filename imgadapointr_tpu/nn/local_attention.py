"""Local / deformable / graph attention variants (flax.linen).

Semantics match the reference attention zoo (models/Transformer_utils.py):
- ``DeformableLocalAttention``           → :161-268  ('rw_deform')
- ``DeformableLocalCrossAttention``      → :271-493  ('deform', incl. the
  two-phase kNN denoise branch at :392-491)
- ``ImprovedDeformableLocalCrossAttention`` → :495-623 (offsets scaled by the
  local bbox half-extent)
- ``ImprovedDeformableLocalGraphAttention`` → :625-777 ('deform_graph')
- ``DynamicGraphAttention``              → :779-860  ('graph')

TPU design notes. Channel groups are kept as a tensor axis (b g n k c) instead
of being folded into the batch dim; the k-neighbour axis is small (k=8-16), so
all "local attention" reduces to small batched einsums that XLA pads onto the
VPU/MXU. ``denoise_length`` is a static Python int (0 = off): the train and
eval graphs are separate jit specialisations, which is how the reference's
``self.training`` branch maps onto XLA.
"""

from __future__ import annotations

from typing import Optional

import einops
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import index_points, knn_point, three_nn_interpolate
from .layers import dense, gelu, leaky_relu


class OffsetNet(nn.Module):
    """Learned 3D offsets: Dense(dim) → LN → GELU → Dense(3, no bias) → tanh.

    Reference models/Transformer_utils.py:187-192 (``linear_offset``).
    """

    dim: int

    @nn.compact
    def __call__(self, x):
        x = dense(self.dim)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = gelu(x)
        return jnp.tanh(dense(3, use_bias=False)(x))


def _grouped_deform_gather(
    offset_net: OffsetNet,
    q_proj: jax.Array,  # (B, N, C) projected queries
    v: jax.Array,  # (B, M, C) raw value features (interpolation source)
    v_off_local: jax.Array,  # (B, N, k, C) gathered offset features
    local_v_pos: jax.Array,  # (B, N, k, 3) gathered neighbour positions
    v_pos: jax.Array,  # (B, M, 3) value positions
    n_group: int,
    scale_by_bbox: bool = False,
) -> jax.Array:
    """Shared deformable core: predict offsets per channel-group, shift the
    neighbour positions, re-sample features there by inverse-distance 3-NN.

    Returns (B, N, k, C) interpolated features.
    """
    B, N, k, C = v_off_local.shape
    g = n_group
    cg = C // g

    off_local_v = einops.rearrange(v_off_local, "b n k (g c) -> b g n k c", g=g)
    group_q = einops.rearrange(q_proj, "b n (g c) -> b g n c", g=g)
    shift_feat = jnp.concatenate(
        [off_local_v, jnp.broadcast_to(group_q[:, :, :, None], (B, g, N, k, cg))],
        axis=-1,
    )
    offset = offset_net(shift_feat)  # (B, g, N, k, 3)

    pos = jnp.broadcast_to(local_v_pos[:, None], (B, g, N, k, 3))
    if scale_by_bbox:
        # Offsets live inside the local bbox: scale by half its extent
        # (reference models/Transformer_utils.py:574-576).
        extent = jnp.max(pos, axis=-2) - jnp.min(pos, axis=-2)  # (B, g, N, 3)
        offset = offset * (0.5 * extent[..., None, :])
    shift_pos = pos + offset

    shift_flat = einops.rearrange(shift_pos, "b g n k c -> (b g) (n k) c")
    v_pos_g = einops.repeat(v_pos, "b m c -> (b g) m c", g=g)
    v_g = einops.rearrange(v, "b m (g c) -> (b g) m c", g=g)
    interp = three_nn_interpolate(shift_flat, v_pos_g, v_g)  # (Bg, Nk, cg)
    return einops.rearrange(interp, "(b g) (n k) c -> b n k (g c)", g=g, n=N, k=k)


def _local_cross_attn(q_proj, k_feat, v_feat, num_heads, scale):
    """1×k cross-attention per token: (B,N,C) query vs (B,N,k,C) region."""
    B, N, k, C = k_feat.shape
    qh = einops.rearrange(q_proj, "b n (h d) -> b h n d", h=num_heads)
    kh = einops.rearrange(k_feat, "b n k (h d) -> b h n k d", h=num_heads)
    vh = einops.rearrange(v_feat, "b n k (h d) -> b h n k d", h=num_heads)
    attn = jnp.einsum(
        "bhnd,bhnkd->bhnk", qh, kh,
        preferred_element_type=jnp.promote_types(qh.dtype, jnp.float32),
    )
    attn = jax.nn.softmax(attn * scale, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhnk,bhnkd->bhnd", attn, vh)
    return einops.rearrange(out, "b h n d -> b n (h d)")


def _two_phase_knn_gather(k, q_pos, v_pos, feats, denoise_length):
    """Two-phase kNN for the denoise task (reference :410-429).

    Real queries (prefix) search neighbours only among real tokens; denoise
    queries (suffix of length ``denoise_length``) search among all tokens.
    Returns gathered (B, N, k, C_i) for each array in ``feats`` (positions
    included by passing v_pos in feats).
    """
    L = denoise_length
    idx_r = knn_point(k, v_pos[:, :-L], q_pos[:, :-L])
    idx_n = knn_point(k, v_pos, q_pos[:, -L:])
    outs = []
    for f in feats:
        g_r = index_points(f[:, :-L], idx_r)
        g_n = index_points(f, idx_n)
        outs.append(jnp.concatenate([g_r, g_n], axis=1))
    return outs


class DeformableLocalAttention(nn.Module):
    """'rw_deform': deformable gather → k×k region self-attn → maxpool.

    Reference models/Transformer_utils.py:161-268.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(self, x, pos, idx=None, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        scale = self.qk_scale or D**-0.5
        if idx is None:
            idx = knn_point(self.k, pos, pos)
        q = dense(C, use_bias=self.qkv_bias, name="proj_q")(x)
        v_off = dense(C, use_bias=self.qkv_bias, name="proj_v_off")(x)
        local_v = index_points(v_off, idx)
        local_v_pos = index_points(pos, idx)
        interp = _grouped_deform_gather(
            OffsetNet(self.dim, name="linear_offset"),
            q, x, local_v, local_v_pos, pos, self.n_group,
        )
        # k×k local self-attention then max over the region
        local_q = index_points(q, idx)  # B N k C
        kf = dense(C, use_bias=self.qkv_bias, name="proj_k")(interp)
        vf = dense(C, use_bias=self.qkv_bias, name="proj_v")(interp)
        qh = einops.rearrange(local_q, "b n k (h d) -> b h n k d", h=H)
        kh = einops.rearrange(kf, "b n k (h d) -> b h n k d", h=H)
        vh = einops.rearrange(vf, "b n k (h d) -> b h n k d", h=H)
        attn = jnp.einsum(
            "bhnkd,bhnld->bhnkl", qh, kh,
            preferred_element_type=jnp.promote_types(qh.dtype, jnp.float32),
        )
        attn = jax.nn.softmax(attn * scale, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhnkl,bhnld->bhnkd", attn, vh)
        out = einops.rearrange(out, "b h n k d -> b n k (h d)")
        out = jnp.max(out, axis=2)
        out = dense(C, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class DeformableLocalCrossAttention(nn.Module):
    """'deform': deformable gather → 1×k cross-attn per token.

    Self-attn (q=v) or cross-attn; supports the two-phase-kNN denoise branch.
    Reference models/Transformer_utils.py:271-493.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(
        self,
        q,
        q_pos,
        v=None,
        v_pos=None,
        idx=None,
        denoise_length: int = 0,
        deterministic: bool = True,
    ):
        C = self.dim
        scale = self.qk_scale or (C // self.num_heads) ** -0.5
        offset_net = OffsetNet(C, name="linear_offset")
        if denoise_length == 0:
            if v is None:
                v = q
            if v_pos is None:
                v_pos = q_pos
            if idx is None:
                idx = knn_point(self.k, v_pos, q_pos)
            qp = dense(C, use_bias=self.qkv_bias, name="proj_q")(q)
            v_off = dense(C, use_bias=self.qkv_bias, name="proj_v_off")(v)
            local_v = index_points(v_off, idx)
            local_v_pos = index_points(v_pos, idx)
        else:
            # denoise branch: self-attn only, idx computed online
            assert v is None and v_pos is None and idx is None
            v, v_pos = q, q_pos
            qp = dense(C, use_bias=self.qkv_bias, name="proj_q")(q)
            v_off = dense(C, use_bias=self.qkv_bias, name="proj_v_off")(v)
            local_v, local_v_pos = _two_phase_knn_gather(
                self.k, q_pos, v_pos, (v_off, v_pos), denoise_length
            )
        interp = _grouped_deform_gather(
            offset_net, qp, v, local_v, local_v_pos, v_pos, self.n_group
        )
        kf = dense(C, use_bias=self.qkv_bias, name="proj_k")(interp)
        vf = dense(C, use_bias=self.qkv_bias, name="proj_v")(interp)
        out = _local_cross_attn(qp, kf, vf, self.num_heads, scale)
        out = dense(C, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class ImprovedDeformableLocalCrossAttention(nn.Module):
    """'deform' with offsets scaled to the local bbox half-extent.

    Reference models/Transformer_utils.py:495-623.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    k: int = 10
    n_group: int = 2

    @nn.compact
    def __call__(self, q, q_pos, v=None, v_pos=None, idx=None, deterministic=True):
        C = self.dim
        scale = self.qk_scale or (C // self.num_heads) ** -0.5
        if v is None:
            v = q
        if v_pos is None:
            v_pos = q_pos
        if idx is None:
            idx = knn_point(self.k, v_pos, q_pos)
        qp = dense(C, use_bias=self.qkv_bias, name="proj_q")(q)
        v_off = dense(C, use_bias=self.qkv_bias, name="proj_v_off")(v)
        local_v = index_points(v_off, idx)
        local_v_pos = index_points(v_pos, idx)
        interp = _grouped_deform_gather(
            OffsetNet(C, name="linear_offset"),
            qp, v, local_v, local_v_pos, v_pos, self.n_group,
            scale_by_bbox=True,
        )
        kf = dense(C, use_bias=self.qkv_bias, name="proj_k")(interp)
        vf = dense(C, use_bias=self.qkv_bias, name="proj_v")(interp)
        out = _local_cross_attn(qp, kf, vf, self.num_heads, scale)
        out = dense(C, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class ImprovedDeformableLocalGraphAttention(nn.Module):
    """'deform_graph': bbox-scaled deformable gather + DGCNN edge-conv.

    Reference models/Transformer_utils.py:625-777.
    """

    dim: int
    k: int = 10

    @nn.compact
    def __call__(
        self, q, q_pos, v=None, v_pos=None, idx=None, denoise_length: int = 0,
        deterministic: bool = True,
    ):
        C = self.dim
        B, N, _ = q.shape
        if denoise_length == 0:
            if v is None:
                v = q
            if v_pos is None:
                v_pos = q_pos
            if idx is None:
                idx = knn_point(self.k, v_pos, q_pos)
            v_off = dense(C, name="proj_v_off")(v)
            off_local_v = index_points(v_off, idx)
            local_v_pos = index_points(v_pos, idx)
        else:
            assert v is None and v_pos is None and idx is None
            v, v_pos = q, q_pos
            v_off = dense(C, name="proj_v_off")(v)
            off_local_v, local_v_pos = _two_phase_knn_gather(
                self.k, q_pos, v_pos, (v_off, v_pos), denoise_length
            )
        # ungrouped offsets (n_group == 1 layout in the reference)
        interp = _grouped_deform_gather(
            OffsetNet(C, name="linear_offset"),
            q, v, off_local_v, local_v_pos, v_pos, n_group=1,
            scale_by_bbox=True,
        )
        qk = jnp.broadcast_to(q[:, :, None], interp.shape)
        feature = jnp.concatenate([interp - qk, qk], axis=-1)
        out = leaky_relu(dense(C, name="knn_map")(feature))
        return jnp.max(out, axis=2)


class DynamicGraphAttention(nn.Module):
    """'graph': plain kNN gather + edge-conv (cat(nbr−q, q) → Dense → LReLU → max).

    Reference models/Transformer_utils.py:779-860.
    """

    dim: int
    k: int = 10

    @nn.compact
    def __call__(
        self, q, q_pos, v=None, v_pos=None, idx=None, denoise_length: int = 0,
        deterministic: bool = True,
    ):
        C = self.dim
        # The reference applies knn_map to the k-expanded edge tensor
        # (models/Transformer_utils.py:848-852): N·k rows through a (2C, C)
        # dense. COMMUTED here past the gather with the SAME single kernel
        # (virtual W1/W2 halves selected by zero-padding the input):
        #   cat(nbr − q, q) @ [W1; W2] + b
        #     == gather(v·W1 + b) + (q·(W2−W1) + b) − b
        # — 4× fewer MXU FLOPs at k=8 (two N-row 2C-wide dots instead of one
        # N·k-row dot) and the k-expanded wgrad disappears from the
        # backward. Reassociation-only vs the cat form (tested); kNN
        # selection and the gather itself are unchanged.
        d = dense(C, name="knn_map")
        if denoise_length == 0:
            if v is None:
                v = q
            if v_pos is None:
                v_pos = q_pos
            if idx is None:
                idx = knn_point(self.k, v_pos, q_pos)
            u = d(jnp.concatenate([v, jnp.zeros_like(v)], axis=-1))  # v·W1 + b
            local_u = index_points(u, idx)
        else:
            assert v is None and v_pos is None and idx is None
            u = d(jnp.concatenate([q, jnp.zeros_like(q)], axis=-1))
            (local_u,) = _two_phase_knn_gather(
                self.k, q_pos, q_pos, (u,), denoise_length
            )
        c = d(jnp.concatenate([-q, q], axis=-1))  # q·(W2−W1) + b
        b = d(jnp.zeros((1, 1, 2 * C), q.dtype))  # bias
        out = leaky_relu(local_u + c[:, :, None] - b[:, None])
        return jnp.max(out, axis=2)
