"""Pallas weighted-gather-sum: ``out[b,s] = Σ_m w[b,s,m] · feats[b, idx[b,s,m]]``.

The XLA formulation (``index_points`` gather then weighted reduce — the hot
aggregation of GDANet's Geometry-Disentangle Module, models/gdanet.py:gdm,
reference GDANet_util.py:128-143) materialises a (B, S, K, C) neighbour
tensor in HBM (132 MB at the superset recipe: B16 S512 K63 C64) plus a
layout copy, and its backward emits a (B, S, K, C) → (B, M, C) scatter-add.
Round-3 trace: ~10.8 ms forward + comparable backward per train step.

Here the sparse weight-row matrix W (S, M) — K nonzeros per row — is built
in VMEM with K compare-select passes and the aggregation is ONE HIGHEST-
precision MXU matmul ``W @ feats``; the backward is two more matmuls
(``dfeats = Wᵀ @ g`` accumulated across row tiles, ``dw = rows of g @ featsᵀ
selected at idx``) — NO HBM gather or scatter anywhere. Same trick as the
fused 3-NN interpolate kernel (nn_distance.py:_three_interp_kernel), with
weights/indices as inputs and K ~ 64.

Numerics: weighted sums, not selections — reassociation-level differences
from the XLA chain (HIGHEST dots; exact index selection by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _build_w(i_tile, w_tile, ts, Mp, k):
    """Sparse weight-row matrix: W[s, j] = Σ_m (idx[s,m]==j)·w[s,m].

    K static compare-select passes over the (TS, Mp) tile; duplicate
    indices within a row accumulate (matches gather-sum semantics).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (ts, Mp), 1)
    W = jnp.zeros((ts, Mp), jnp.float32)
    for m in range(k):
        W = W + jnp.where(col == i_tile[:, m : m + 1], w_tile[:, m : m + 1], 0.0)
    return W


def _fwd_kernel(w_ref, i_ref, f_ref, out_ref, k: int):
    ts = w_ref.shape[0]
    Mp = f_ref.shape[0]
    W = _build_w(i_ref[...], w_ref[...], ts, Mp, k)
    out_ref[...] = jax.lax.dot(
        W, f_ref[...], precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _dfeats_kernel(w_ref, i_ref, g_ref, df_ref, k: int):
    # grid (B, S_tiles): df block (Mp, Cp) is revisited across the
    # sequential s dimension — zero it on the first visit, accumulate after
    ts = w_ref.shape[0]
    Mp = df_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        df_ref[...] = jnp.zeros(df_ref.shape, jnp.float32)

    W = _build_w(i_ref[...], w_ref[...], ts, Mp, k)
    df_ref[...] += jax.lax.dot_general(
        W, g_ref[...], (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # Wᵀ @ g: (Mp, Cp)


def _dweights_kernel(i_ref, g_ref, f_ref, dw_ref, k: int):
    ts = i_ref.shape[0]
    Mp = f_ref.shape[0]
    # G[s, j] = Σ_c g[s,c]·f[j,c] — then dw[s,m] = G[s, idx[s,m]]
    G = jax.lax.dot_general(
        g_ref[...], f_ref[...], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (TS, Mp)
    col = jax.lax.broadcasted_iota(jnp.int32, (ts, Mp), 1)
    for m in range(k):
        pick = jnp.where(col == i_ref[:, m : m + 1], G, 0.0)
        dw_ref[:, m : m + 1] = jnp.sum(pick, axis=1, keepdims=True)


def _pad_args(weights, idx, feats):
    B, S, K = weights.shape
    M, C = feats.shape[1], feats.shape[2]
    Kp = K + ((-K) % 128)
    Mp = M + ((-M) % 128)
    Cp = C + ((-C) % 128)
    # TS from a MEASURED VMEM budget: the unrolled K-pass W build keeps
    # ~41 KB/row live at Mp=512/Cp=128/Kp=128 (TS=512 hit Mosaic's 16 MB
    # scoped limit at 21.05 MB) — i.e. ~20·Mp f32/row, not the ~8·Mp a
    # block count suggests. Budget 24·Mp + 4·Cp + 4·Kp f32/row within 10 MB
    # (flagship Mp=512 → TS=192, measured fit with ~40% slack).
    TS = max(8, min(512, (10 * 1024 * 1024) // (4 * (24 * Mp + 4 * Cp + 4 * Kp))))
    TS = (TS // 8) * 8
    Sp = S + ((-S) % TS)
    wp = jnp.pad(weights.astype(jnp.float32), ((0, 0), (0, Sp - S), (0, Kp - K)))
    # padded entries carry zero weight; index 0 is a safe in-range target
    ip = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, Sp - S), (0, Kp - K)))
    fp = jnp.pad(feats.astype(jnp.float32), ((0, 0), (0, Mp - M), (0, Cp - C)))
    return wp, ip, fp, TS, Sp, Kp, Mp, Cp


def _fwd_impl(weights, idx, feats, interpret=False):
    B, S, K = weights.shape
    C = feats.shape[2]
    wp, ip, fp, TS, Sp, Kp, Mp, Cp = _pad_args(weights, idx, feats)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=K),
        grid=(B, Sp // TS),
        in_specs=[
            pl.BlockSpec((None, TS, Kp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TS, Kp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Mp, Cp), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TS, Cp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Cp), jnp.float32),
        interpret=interpret,
    )(wp, ip, fp)
    return out[:, :S, :C]


def _bwd_impl(weights, idx, feats, g, interpret=False):
    B, S, K = weights.shape
    M, C = feats.shape[1], feats.shape[2]
    wp, ip, fp, TS, Sp, Kp, Mp, Cp = _pad_args(weights, idx, feats)
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, Sp - S), (0, Cp - C)))
    dfeats = pl.pallas_call(
        functools.partial(_dfeats_kernel, k=K),
        grid=(B, Sp // TS),
        in_specs=[
            pl.BlockSpec((None, TS, Kp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TS, Kp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TS, Cp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, Mp, Cp), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Mp, Cp), jnp.float32),
        interpret=interpret,
    )(wp, ip, gp)
    dweights = pl.pallas_call(
        functools.partial(_dweights_kernel, k=K),
        grid=(B, Sp // TS),
        in_specs=[
            pl.BlockSpec((None, TS, Kp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TS, Cp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Mp, Cp), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TS, Kp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Kp), jnp.float32),
        interpret=interpret,
    )(ip, gp, fp)
    return dweights[:, :S, :K], dfeats[:, :M, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def weighted_gather_sum_pallas(weights, idx, feats, interpret=False):
    """out (B, S, C) = Σ_m weights[b,s,m] · feats[b, idx[b,s,m], :].

    Gradients flow to ``weights`` and ``feats``; ``idx`` is discrete.
    """
    return _fwd_impl(weights, idx, feats, interpret)


def _wgs_fwd(weights, idx, feats, interpret):
    return _fwd_impl(weights, idx, feats, interpret), (weights, idx, feats)


def _wgs_bwd(interpret, res, g):
    import numpy as np

    weights, idx, feats = res
    dw, df = _bwd_impl(weights, idx, feats, g, interpret)
    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)  # int primal
    return dw.astype(weights.dtype), didx, df.astype(feats.dtype)


weighted_gather_sum_pallas.defvjp(_wgs_fwd, _wgs_bwd)
