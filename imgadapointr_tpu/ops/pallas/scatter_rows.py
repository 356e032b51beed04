"""Pallas batched row scatter-add: ``out[b, idx[b, s], :] += vals[b, s, :]``.

The chamfer backward's cross-term is a scatter-add of per-point gradient
rows into the opposite cloud (reference extensions/chamfer_dist/chamfer.cu:
173-229 does it with atomicAdd; ops/chamfer.py uses a deterministic XLA
scatter). XLA's TPU scatter is row-rate bound like its gather: the two
16384-row chamfer-VJP scatters cost 3.8 + 1.8 ms of the 113.6 ms flagship
train step (benchmarks/profile.py).

This kernel reformulates the scatter as MXU matmuls against one-hot
masks — no serialisation, no atomics, fully vectorised:

    idx = hi·128 + lo;   out[c][h, l] += Σ_q onehot_hi[h, q] · (onehot_lo[q, l] · val[q, c])

Per 128-source subtile and channel that is ONE 128×128×128 matmul into a
VMEM-resident (C, M/128, 128) accumulator. ``Precision.HIGHEST`` (bf16x3)
makes each product exact (the one-hot operand splits as (1,0,0), the value
operand's 3×8 mantissa bits cover f32), so every contribution lands at
full f32 precision; only the ACCUMULATION ORDER differs from the XLA
scatter (subtile-major vs index-major), i.e. results match XLA to f32
rounding, not bit-for-bit. Values are identical when each output row
receives ≤ 1 contribution.

Gated to M ≤ 16384, C ≤ 8 (VMEM accumulator ≤ 512 KB), total source rows
≥ 2^15. Train-path integration is convergence-gated (21-epoch synthetic
A/B, benchmarks/RESULTS.md harness) because gradient sums reorder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_M = 16384
MAX_C = 8


def _scatter_kernel(idx_ref, val_ref, out_ref, G: int, SU: int, C: int):
    """idx_ref: (1, TS); val_ref: (TS, Cp); out_ref: (C, G, 128) [c, hi, lo]."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for u in range(SU):
        sl = slice(u * 128, (u + 1) * 128)
        idxq = idx_ref[0:1, sl]  # (1, 128)
        lo = jnp.bitwise_and(idxq, 127)
        hi = jnp.right_shift(idxq, 7)
        # onehot_hi[h, q] = (h == hi_q): iota over sublanes vs lane-bcast idx
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
        onehot_hi = (iota_h == jnp.broadcast_to(hi, (G, 128))).astype(
            val_ref.dtype
        )
        # onehot_lo[q, l] = (l == lo_q): iota over lanes vs per-row idx
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        onehot_lo = (iota_l == jnp.broadcast_to(lo.T, (128, 128))).astype(
            val_ref.dtype
        )
        vals = val_ref[sl, :]  # (128, Cp)
        # HIGHEST (bf16x3): the 0/1 one-hot splits as (1,0,0) so every
        # product is exact; only accumulation order differs from XLA.
        # Per-channel dots measured faster than one channel-concatenated
        # wide dot (2.19 vs 2.52 ms at 16×16384); per-operand precision
        # would halve the passes but Mosaic's dot lowering rejects it.
        for c in range(C):
            masked = onehot_lo * vals[:, c : c + 1]  # (q=128, lo=128)
            contrib = jax.lax.dot_general(
                onehot_hi,
                masked,
                (((1,), (0,)), ((), ())),  # contract q
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (G, 128)
            out_ref[c, :, :] += contrib


def scatter_add_rows_pallas(
    n_rows: int, idx: jax.Array, vals: jax.Array, interpret: bool = False
) -> jax.Array:
    """Deterministic ``out[b, idx[b, s], :] += vals[b, s, :]``; out (B, n_rows, C).

    Matches ``jax.vmap(lambda i, v: zeros.at[i].add(v))`` to f32 rounding
    (exact per-contribution arithmetic; accumulation order differs). Out-of
    -range indices must not occur (callers produce argmin/kNN indices).
    """
    B, S, C = vals.shape
    Mp = n_rows + (-n_rows) % 128
    G = Mp // 128
    Cp = C + (-C) % 8
    Sp = S + (-S) % 128
    TS = min(512, Sp)
    Sp = Sp + (-Sp) % TS

    idxp = jnp.pad(
        idx.astype(jnp.int32), ((0, 0), (0, Sp - S)), constant_values=n_rows
    ).reshape(B, 1, Sp)
    # padded sources carry val 0 (land on a padded row anyway when n_rows<Mp;
    # when n_rows == Mp they land on row... guard: clamp into the pad row's
    # range only via zero values)
    idxp = jnp.minimum(idxp, Mp - 1)
    valp = jnp.pad(vals, ((0, 0), (0, Sp - S), (0, Cp - C)))

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, G=G, SU=TS // 128, C=C),
        grid=(B, Sp // TS),
        in_specs=[
            pl.BlockSpec(
                (None, 1, TS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, TS, Cp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, C, G, 128),
            lambda b, s: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, G, 128), jnp.float32),
        interpret=interpret,
    )(idxp, valp)
    # (B, C, G, 128) -> (B, Mp, C) -> slice
    out = out.transpose(0, 2, 3, 1).reshape(B, Mp, C)
    return out[:, :n_rows, :]
