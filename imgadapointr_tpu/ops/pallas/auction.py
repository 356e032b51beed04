"""Pallas fused top-2 kernel for the EMD auction inner loop.

The auction iteration's cost is per-bidder ``(best, second, argbest)`` of
``value_ij = -|x_i - y_j|² - price_j`` (reference CUDA ``Bid`` kernel,
extensions/emd/emd_cuda.cu:85-180). Two levers over the XLA formulation
(ops/emd.py ``_tiled_top2``):

1. **Fused value tile.** The XLA path streams each (N, tile) value field
   through HBM for every reduction; here the tile lives in VMEM and only
   x/y/price stream in (O(N+M)) with three (N,) vectors out. Measured
   alone this is a modest win (622 → 502 ms/sample at the test protocol's
   N = M = 16384×100 iters — XLA fuses the chain well, both are near the
   VPU pass-count floor).
2. **Active-bidder block skipping** — the big one. Only UNASSIGNED bidders
   bid (CUDA parity: ``calc_unass_idx`` compacts bidders every iteration,
   emd_cuda.cu:55-84). The caller compacts active bidder rows to the
   front (ops/emd.py) and passes the active count as an SMEM scalar; grid
   programs whose whole (TN) bidder block lies beyond the count skip the
   item sweep entirely via ``pl.when``. The unassigned count collapses
   geometrically as the auction converges, so total work approaches
   O(N · few) instead of O(N · iterations). Skipped programs still write
   their (stale) output block — the caller masks rows ≥ cnt.

Numerics: diff-form fp32 distances (``dx²+dy²+dz²``) like every other
Pallas geometry kernel in this package — strictly better conditioned than
the XLA path's matmul-form ``|x|²-2x·y+|y|²`` (HIGHEST), whose f32
cancellation floor can flip near-tie picks. The auction is an
(eps, iterations)-controlled approximation by construction (reference
emd_module.py:31-72), so near-tie assignment differences are within the
algorithm's own tolerance; the Hungarian-agreement test in
tests/test_protocols.py gates both paths.

Tie-breaks match the XLA path: best item = FIRST (lowest) index among
maxima (jnp.argmax semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: jnp constants would be captured tracers
_IBIG = 0x7FFFFFFF


def _top2_kernel(
    x_ref, y_ref, price_ref, cnt_ref, best_ref, second_ref, besti_ref,
    tm: int, sub: int,
):
    # x_ref: (TN, 8) bidder coords (cols 0:3); y_ref: (8, Mp) item coords;
    # price_ref: (1, Mp); cnt_ref: (B, 1) SMEM active-bidder counts (full
    # array — Mosaic requires SMEM blocks to equal the array dims unless
    # (8, 128)-divisible, so per-sample blocking is not expressible);
    # outputs (TN//128, 128) flat row-major == (TN,).
    #
    # The TN-row block is processed as TN/sub statically-unrolled SUB-BLOCKS,
    # each gated by its own pl.when — skip granularity is ``sub`` rows, not
    # the whole block (Mosaic's output-block divisibility rule forbids
    # TN < 1024 grids with (rows, 128) blocks, so fine-grained skipping must
    # live INSIDE the kernel). With the auction's geometrically-collapsing
    # active count the sweep cost becomes ceil(cnt/sub)·sub rows × Mp.
    tn = x_ref.shape[0]
    Mp = y_ref.shape[1]
    m_chunks = Mp // tm
    b = pl.program_id(0)
    n = pl.program_id(1)
    col_local = jax.lax.broadcasted_iota(jnp.int32, (sub, tm), 1)

    for s in range(tn // sub):
        @pl.when(n * tn + s * sub < cnt_ref[b, 0])
        def _(s=s):
            xx = x_ref[s * sub:(s + 1) * sub, 0:1]
            xy = x_ref[s * sub:(s + 1) * sub, 1:2]
            xz = x_ref[s * sub:(s + 1) * sub, 2:3]

            def chunk(ci, carry):
                best, second, best_i = carry
                ms = pl.ds(pl.multiple_of(ci * tm, tm), tm)
                dx = xx - y_ref[0:1, ms]
                dy = xy - y_ref[1:2, ms]
                dz = xz - y_ref[2:3, ms]
                v = -(dx * dx + dy * dy + dz * dz) - price_ref[0:1, ms]  # (sub, tm)
                c1 = jnp.max(v, axis=1, keepdims=True)
                # first-index argmax (jnp.argmax semantics, like the XLA path)
                c1i_local = jnp.min(
                    jnp.where(v == c1, col_local, jnp.int32(_IBIG)),
                    axis=1, keepdims=True,
                )
                c2 = jnp.max(
                    jnp.where(col_local == c1i_local, -_BIG, v),
                    axis=1, keepdims=True,
                )
                c1i = c1i_local + ci * tm
                upd = c1 > best
                second = jnp.where(
                    upd, jnp.maximum(best, c2), jnp.maximum(second, c1)
                )
                best = jnp.where(upd, c1, best)
                best_i = jnp.where(upd, c1i, best_i)
                return best, second, best_i

            init = (
                jnp.full((sub, 1), -_BIG),
                jnp.full((sub, 1), -_BIG),
                jnp.zeros((sub, 1), jnp.int32),
            )
            best, second, best_i = jax.lax.fori_loop(0, m_chunks, chunk, init)
            r0, r1 = s * sub // 128, (s + 1) * sub // 128
            best_ref[r0:r1, :] = best.reshape(sub // 128, 128)
            second_ref[r0:r1, :] = second.reshape(sub // 128, 128)
            besti_ref[r0:r1, :] = best_i.reshape(sub // 128, 128)


def auction_top2_pallas(
    x: jax.Array,
    y: jax.Array,
    price: jax.Array,
    cnt: jax.Array | None = None,
    tile_n: int = 1024,
    tile_m: int = 512,
    sub_n: int = 128,
    interpret: bool = False,
):
    """Batched fused auction top-2: (best, second, best_item) per bidder.

    x (B, N, 3) bidders; y (B, M, 3) items; price (B, M). Returns three
    (B, N) arrays: max / second-max of ``-|x-y|² - price`` over items and
    the (first-index) arg of the max. Items are padded to a lane multiple
    with a far sentinel (value ≈ -1e12, never wins) — semantically the
    same padding as ``ops.emd._pad_items``.

    ``cnt`` (B,) int32: number of leading bidder rows that are active.
    ``sub_n``-row sub-blocks that lie entirely at or beyond ``cnt`` skip
    the item sweep; their output rows are STALE GARBAGE and must be masked
    by the caller. ``None`` means all rows are active.
    """
    B, N, _ = x.shape
    M = y.shape[1]
    TN = min(tile_n, max(1024, N))
    pad_n = (-N) % TN
    Npad = N + pad_n
    pad_m128 = (-M) % 128
    TM = min(tile_m, M + pad_m128)
    pad_m = (-M) % TM
    Mp = M + pad_m

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 5)))
    yt = jnp.transpose(y.astype(jnp.float32), (0, 2, 1))
    yt = jnp.pad(yt, ((0, 0), (0, 5), (0, pad_m)), constant_values=1e6)
    pp = jnp.pad(price.astype(jnp.float32), ((0, 0), (0, pad_m)))[:, None, :]
    if cnt is None:
        cnt = jnp.full((B,), N, jnp.int32)
    cnt2 = cnt.astype(jnp.int32).reshape(B, 1)

    sub = min(sub_n, TN)
    rows = TN // 128
    best, second, best_i = pl.pallas_call(
        functools.partial(_top2_kernel, tm=TM, sub=sub),
        grid=(B, Npad // TN),
        in_specs=[
            pl.BlockSpec((None, TN, 8), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, n: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.int32),
        ),
        interpret=interpret,
    )(xp, yt, pp, cnt2)
    best = best.reshape(B, Npad)[:, :N]
    second = second.reshape(B, Npad)[:, :N]
    # clip, not abs+min: abs(INT32_MIN) == INT32_MIN, so a garbage word in a
    # skipped sub-block could otherwise escape the [0, M) contract negative
    best_i = jnp.clip(best_i.reshape(B, Npad)[:, :N], 0, M - 1)
    return best, second, best_i
