"""Base transformer layers (flax.linen), batch-last (B, N, C) layout throughout.

Functional parity targets (semantics, not code) in the reference:
- ``Mlp``            → models/Transformer_utils.py:71-87
- ``Attention``      → models/Transformer_utils.py:89-122 (additive bool mask,
                       1 = masked → -inf before softmax)
- ``CrossAttention`` → models/Transformer_utils.py:124-159
- ``LayerScale``     → models/Transformer_utils.py:862-869
- ``DropPath``       → timm stochastic depth used at models/base_blocks.py:36 etc.
- ``BatchNorm``      → torch.nn.BatchNorm1d + the BN-momentum scheduler
                       (utils/misc.py:119-149): momentum is a *call-time*
                       argument (torch semantics: new_ra = (1-m)·ra + m·batch)
                       so the per-epoch schedule never triggers a recompile.

TPU notes: GELU is exact (erf) to match torch's default; attention keeps the
(B, H, N, D) layout that XLA maps cleanly onto the MXU; all softmax logits are
computed in float32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Reference init: trunc_normal(std=.02) weights, zero bias for Linear;
# ones/zeros for norm layers (models/base_blocks.py:421-428).
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def dense(features: int, use_bias: bool = True, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=trunc_normal_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


class Mlp(nn.Module):
    """2-layer MLP with GELU (reference models/Transformer_utils.py:71-87)."""

    hidden_features: int
    out_features: int
    act: Callable = gelu
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = dense(self.hidden_features, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(self.out_features, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class ConcatDense(nn.Module):
    """Dense over a (virtual) feature-concat of several inputs.

    ``ConcatDense(F)(a, b, c) == concat([a, b, c], -1) @ W + bias`` with
    ``W = stack([Wa, Wb, Wc])``, but computed as per-part matmuls summed
    together. Two wins on TPU:

    1. Parts with broadcast leading dims (e.g. a global feature (B, 1, C)
       against tokens (B, M, C)) are contracted *before* broadcasting — the
       reference's ``global.expand(-1, M, -1)`` + concat + Linear pattern
       (e.g. AdaPoinTr.py:226-239, base_blocks.py:762-766) does M redundant
       matmul rows and materialises the concat buffer in HBM.
    2. Avoids an XLA TPU fusion-cost-model crash (fusion_util.cc assertion)
       triggered by reduce→broadcast→concat→dot→reshape chains.

    Checkpoint layout: one kernel per part (``part0..partN``) + one bias; a
    reference fused Linear kernel converts by row-splitting.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, *parts):
        out = None
        for i, p in enumerate(parts):
            y = dense(
                self.features, use_bias=(self.use_bias and i == 0), name=f"part{i}"
            )(p)
            out = y if out is None else out + y
        return out


class LayerScale(nn.Module):
    """Per-channel learned scale (reference models/Transformer_utils.py:862-869)."""

    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,)
        )
        return x * gamma


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def _sdpa(q, k, v, scale, mask=None, dropout=None):
    """Scaled dot-product attention on (B, H, N, D) tensors, fp32 softmax."""
    # accumulate in >= f32 (f32 for bf16/f32 inputs; f64 under x64 parity runs)
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
    )
    attn = attn * scale
    if mask is not None:
        attn = jnp.where(mask, jnp.finfo(attn.dtype).min, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    if dropout is not None:
        attn = dropout(attn)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
    return out


class Attention(nn.Module):
    """Multi-head self-attention with optional boolean mask (1 = masked).

    Reference models/Transformer_utils.py:89-122. The mask implements the
    denoise-task visibility rule (real queries must not see denoise tokens).
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        scale = self.qk_scale or D**-0.5
        qkv = dense(C * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if mask is not None:
            mask = jnp.broadcast_to(mask.astype(bool), (B, H, N, N))
        adrop = (
            None
            if self.attn_drop == 0.0
            else lambda a: nn.Dropout(self.attn_drop, name="attn_drop")(
                a, deterministic=deterministic
            )
        )
        out = _sdpa(q, k, v, scale, mask, adrop)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = dense(C, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """Multi-head cross-attention, q from queries, k=v from memory.

    Reference models/Transformer_utils.py:124-159.
    """

    dim: int
    out_dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, q, v, deterministic: bool = True):
        B, N, _ = q.shape
        M = v.shape[1]
        C = self.out_dim
        H = self.num_heads
        D = C // H
        scale = self.qk_scale or D**-0.5
        qh = dense(C, use_bias=self.qkv_bias, name="q_map")(q).reshape(B, N, H, D)
        kh = dense(C, use_bias=self.qkv_bias, name="k_map")(v).reshape(B, M, H, D)
        vh = dense(C, use_bias=self.qkv_bias, name="v_map")(v).reshape(B, M, H, D)
        qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (qh, kh, vh))
        adrop = (
            None
            if self.attn_drop == 0.0
            else lambda a: nn.Dropout(self.attn_drop, name="attn_drop")(
                a, deterministic=deterministic
            )
        )
        out = _sdpa(qh, kh, vh, scale, None, adrop)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = dense(C, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class BatchNorm(nn.Module):
    """BatchNorm over the last axis with *call-time* torch-style momentum.

    Equivalent to torch.nn.BatchNorm1d applied to (B, C, N) tensors (here we
    keep (B, N, C) and normalise over all non-channel axes). ``momentum`` is
    a traced argument so the reference's BN-momentum scheduler
    (utils/misc.py:119-149, configs ``bnmscheduler``) maps to passing a new
    scalar per epoch — no recompilation.

    torch semantics: running = (1 - momentum) * running + momentum * batch.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True, momentum=0.1):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            # stats in >= f32 (f32 for bf16/f32 inputs; f64 under x64 parity)
            x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(x32, axis=reduce_axes)
            var = jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mean)
            # cross-device batch stats (SyncBN analog) are handled by the
            # caller sharding the batch axis; XLA's reduction over a sharded
            # axis already produces global statistics under pjit.
            n = x.size // self.features
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                # momentum in the stats' accumulation dtype: f32 normally,
                # f64 under the x64 gradient-parity harness (a hard f32
                # cast of 0.9 costs ~3e-8 relative on every stat update)
                m = jnp.asarray(momentum, mean.dtype)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias
