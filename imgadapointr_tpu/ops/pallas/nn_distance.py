"""Pallas tiled nearest-neighbour kernels: chamfer min-distance and kNN.

Replaces the XLA formulation for the two hot geometry ops:

- The XLA chamfer path computes ``|x|²-2x·y+|y|²`` via a K=3 matmul — 2%
  MXU lane utilisation at fp32 (HIGHEST) — and streams (B, N, tile) blocks
  through HBM. Here distances are computed in diff-form on the VPU entirely
  in VMEM; only (dist, argmin) leave the kernel.
- The XLA kNN materialises the (B, N, M) matrix in HBM and runs a
  sort-based ``top_k`` (~57ms at 32×2048²). Here the distance tile stays in
  VMEM and k neighbours are peeled with k min-extraction passes.

Grid is over batch only; point tiles are looped inside the kernel with
lane-aligned dynamic stores (per-tile grid programs would force output
blocks that violate Mosaic's (8, 128) divisibility rule).

Numerics: diff-form fp32 — strictly better than the cancellation-prone
matmul form (no bf16 issue at all).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: jnp constants would be captured tracers


def _dist_tile(xx, xy, xz, yx, yy, yz):
    """(TN,1) coords vs (1,TM) coords → (TN,TM) squared distances."""
    dx = xx - yx
    dy = xy - yy
    dz = xz - yz
    return dx * dx + dy * dy + dz * dz


def _nn_kernel(x_ref, y_ref, dist_ref, idx_ref, tm: int, n_valid_y: int):
    # x_ref: (TN, 8); y_ref: (8, Mp); dist_ref/idx_ref: (TN//128, 128)
    tn = x_ref.shape[0]
    Mp = y_ref.shape[1]
    m_chunks = Mp // tm
    xx = x_ref[:, 0:1]
    xy = x_ref[:, 1:2]
    xz = x_ref[:, 2:3]

    def chunk(ci, carry):
        best_d, best_i = carry
        ms = pl.ds(pl.multiple_of(ci * tm, tm), tm)
        d = _dist_tile(xx, xy, xz, y_ref[0:1, ms], y_ref[1:2, ms], y_ref[2:3, ms])
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + ci * tm
        d = jnp.where(col < n_valid_y, d, _BIG)
        dmin = jnp.min(d, axis=1, keepdims=True)
        amin = jnp.min(jnp.where(d == dmin, col, Mp), axis=1, keepdims=True)
        upd = dmin < best_d
        return jnp.where(upd, dmin, best_d), jnp.where(upd, amin, best_i)

    init = (jnp.full((tn, 1), _BIG), jnp.zeros((tn, 1), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, m_chunks, chunk, init)
    # outputs laid out (TN//128, 128); row-major == flat (TN,)
    dist_ref[...] = best_d.reshape(tn // 128, 128)
    idx_ref[...] = best_i.reshape(tn // 128, 128)


def nn_one_direction_pallas(
    x: jax.Array, y: jax.Array, tile_n: int = 1024, tile_m: int = 1024
):
    """For each x, (squared distance, index) of the nearest y. TPU Pallas."""
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
    yt = jnp.pad(yt, ((0, 0), (0, 5), (0, pad_m)), constant_values=1e9)

    rows = TN // 128
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, tm=TM, n_valid_y=M),
        grid=(B, Npad // TN),
        in_specs=[
            pl.BlockSpec((None, TN, 8), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.int32),
        ),
    )(xp, yt)
    return dist.reshape(B, Npad)[:, :N], idx.reshape(B, Npad)[:, :N]


def _nn_packed_kernel(x_ref, y_ref, idx_ref, tm: int, idx_bits: int):
    """Argmin via packed distance|index integers.

    For d >= 0, the f32 bit pattern is monotone as an int32, so
    ``(bits(d) & ~mask) | col`` sorts by (d quantized to 23-idx_bits mantissa
    bits, then col) — one running int-min yields the argmin with first-index
    tie-breaks, replacing the 4-op min/compare/select/min argmin dance with
    2 bit-ops + 1 min per pair. The (quantized) distance is discarded; the
    caller recomputes it exactly from the index (O(N) gather + diff).
    """
    tn = x_ref.shape[0]
    Mp = y_ref.shape[1]
    m_chunks = Mp // tm
    mask = (1 << idx_bits) - 1
    xx = x_ref[:, 0:1]
    xy = x_ref[:, 1:2]
    xz = x_ref[:, 2:3]

    def chunk(ci, best):
        ms = pl.ds(pl.multiple_of(ci * tm, tm), tm)
        d = _dist_tile(xx, xy, xz, y_ref[0:1, ms], y_ref[1:2, ms], y_ref[2:3, ms])
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + ci * tm
        packed = (jax.lax.bitcast_convert_type(d, jnp.int32) & ~mask) | col
        return jnp.minimum(best, jnp.min(packed, axis=1, keepdims=True))

    init = jnp.full((tn, 1), jnp.int32(0x7FFFFFFF))
    best = jax.lax.fori_loop(0, m_chunks, chunk, init)
    idx_ref[...] = (best & mask).reshape(tn // 128, 128)


def nn_argmin_pallas(
    x: jax.Array, y: jax.Array, tile_n: int = 1024, tile_m: int = 1024
):
    """Index of the nearest ``y`` per ``x`` (no distances). TPU Pallas.

    Requires M (padded) <= 2^18; the index is packed into the low mantissa
    bits of the f32 distance, leaving >= 5 mantissa bits — argmin can differ
    from exact only between candidates within ~2^-6 relative distance of
    each other (practically: 2^-10 at the PCN protocol's M=16384), where
    either choice changes the recomputed distance by the same factor.
    Padded y rows sit at 1e9 per axis, so their distances never win for any
    plausible cloud (|x| << 1e8).
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
    idx_bits = max(1, (Mp - 1).bit_length())
    assert idx_bits <= 18, "index packing needs M <= 2^18"

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 5)))
    yt = jnp.transpose(y.astype(jnp.float32), (0, 2, 1))
    yt = jnp.pad(yt, ((0, 0), (0, 5), (0, pad_m)), constant_values=1e9)

    rows = TN // 128
    idx = pl.pallas_call(
        functools.partial(_nn_packed_kernel, tm=TM, idx_bits=idx_bits),
        grid=(B, Npad // TN),
        in_specs=[
            pl.BlockSpec((None, TN, 8), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.int32),
    )(xp, yt)
    return jnp.minimum(idx.reshape(B, Npad)[:, :N], M - 1)


def _nn_bidir_kernel(
    x_ref, y_ref, rowidx_ref, colmin_ref, tm: int, row_bits: int, col_bits: int
):
    """One pass over the (TN, TM) distance tiles serving BOTH chamfer
    directions: row-wise packed argmin (x→y) written per N-tile, column-wise
    packed min (y→x) accumulated across N-tiles into a block that revisits
    the same output slot for every program in the n grid dimension (Pallas
    TPU grids run sequentially, so read-modify-write accumulation is safe).

    Halves the dominant O(N·M) distance work vs two one-direction passes.
    """
    tn = x_ref.shape[0]
    Mp = y_ref.shape[1]
    m_chunks = Mp // tm
    n = pl.program_id(1)
    row_mask = (1 << row_bits) - 1
    col_mask = (1 << col_bits) - 1
    xx = x_ref[:, 0:1]
    xy = x_ref[:, 1:2]
    xz = x_ref[:, 2:3]

    @pl.when(n == 0)
    def _():
        colmin_ref[...] = jnp.full(colmin_ref.shape, jnp.int32(0x7FFFFFFF))

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 0) + n * tn

    def chunk(ci, best):
        ms = pl.ds(pl.multiple_of(ci * tm, tm), tm)
        d = _dist_tile(xx, xy, xz, y_ref[0:1, ms], y_ref[1:2, ms], y_ref[2:3, ms])
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + ci * tm
        best = jnp.minimum(
            best, jnp.min((bits & ~row_mask) | col, axis=1, keepdims=True)
        )
        cpk = jnp.min((bits & ~col_mask) | row_ids, axis=0, keepdims=True)  # (1, tm)
        colmin_ref[0:1, ms] = jnp.minimum(colmin_ref[0:1, ms], cpk)
        return best

    init = jnp.full((tn, 1), jnp.int32(0x7FFFFFFF))
    best = jax.lax.fori_loop(0, m_chunks, chunk, init)
    rowidx_ref[...] = (best & row_mask).reshape(tn // 128, 128)


def nn_argmin_bidir_pallas(
    x: jax.Array, y: jax.Array, tile_n: int = 1024, tile_m: int = 1024
):
    """(i1, i2): nearest-y index per x AND nearest-x index per y, one pass.

    Same packed-index quantization semantics as ``nn_argmin_pallas``; both
    clouds' pads sit at 1e9 so padded rows never win either direction.
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
    row_bits = max(1, (Mp - 1).bit_length())
    col_bits = max(1, (Npad - 1).bit_length())
    assert row_bits <= 18 and col_bits <= 18, "index packing needs sizes <= 2^18"

    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 5)), constant_values=1e9
    )
    yt = jnp.transpose(y.astype(jnp.float32), (0, 2, 1))
    yt = jnp.pad(yt, ((0, 0), (0, 5), (0, pad_m)), constant_values=1e9)

    rows = TN // 128
    i1, i2 = pl.pallas_call(
        functools.partial(
            _nn_bidir_kernel, tm=TM, row_bits=row_bits, col_bits=col_bits
        ),
        grid=(B, Npad // TN),
        in_specs=[
            pl.BlockSpec((None, TN, 8), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
        ),
    )(xp, yt)
    i1 = jnp.minimum(i1.reshape(B, Npad)[:, :N] & ((1 << row_bits) - 1), M - 1)
    i2 = jnp.minimum(i2.reshape(B, Mp)[:, :M] & ((1 << col_bits) - 1), N - 1)
    return i1, i2


def _nn_bidir_mxu_kernel(
    a_ref, b_ref, xsq_ref, ysq_ref, rowidx_ref, colmin_ref,
    tm: int, row_bits: int, col_bits: int,
):
    """MXU-hybrid bidirectional argmin.

    The cross term −2x·y arrives as a hi-lo bf16 matmul on the MXU
    (A = [−2x_hi, −2x_lo, −2x_hi], B = [y_hi; y_hi; y_lo], f32 accumulate:
    the three products reproduce fp32 x·y to ~2⁻¹⁸ relative, the dropped
    x_lo·y_lo term being below that), leaving the VPU only the epilogue:
    two adds + packed-min per pair for BOTH directions. ~2.6× the pure-VPU
    diff-form kernel at 16×16384².

    Caveat vs the diff-form kernel: d̃ can round slightly negative for
    near-zero distances; negative f32s reverse their int-order, but every
    negative candidate is within rounding of d = 0, so the winner is still
    a true near-tie and the caller's exact recompute bounds the effect.
    """
    tn = a_ref.shape[0]
    Mp = b_ref.shape[1]
    m_chunks = Mp // tm
    n = pl.program_id(1)
    row_mask = (1 << row_bits) - 1
    col_mask = (1 << col_bits) - 1

    @pl.when(n == 0)
    def _():
        colmin_ref[...] = jnp.full(colmin_ref.shape, jnp.int32(0x7FFFFFFF))

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 0) + n * tn
    xsq = xsq_ref[:, 0:1]

    def chunk(ci, best):
        ms = pl.ds(pl.multiple_of(ci * tm, tm), tm)
        P = jnp.dot(a_ref[...], b_ref[:, ms], preferred_element_type=jnp.float32)
        d = (P + ysq_ref[0:1, ms]) + xsq
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + ci * tm
        best = jnp.minimum(
            best, jnp.min((bits & ~row_mask) | col, axis=1, keepdims=True)
        )
        cpk = jnp.min((bits & ~col_mask) | row_ids, axis=0, keepdims=True)
        colmin_ref[0:1, ms] = jnp.minimum(colmin_ref[0:1, ms], cpk)
        return best

    best = jax.lax.fori_loop(
        0, m_chunks, chunk, jnp.full((tn, 1), jnp.int32(0x7FFFFFFF))
    )
    rowidx_ref[...] = (best & row_mask).reshape(tn // 128, 128)


def nn_argmin_bidir_mxu(
    x: jax.Array, y: jax.Array, tile_n: int = 1024, tile_m: int = 1024
):
    """(i1, i2) bidirectional nearest-neighbour argmin, MXU-hybrid.

    Same contract as ``nn_argmin_bidir_pallas`` with a wider (but still
    near-tie-only) selection band: candidates within ~2⁻¹⁷·|x||y| of the
    true minimum may swap. Callers recompute exact distances from the
    indices, so the end effect on chamfer is ≤ the band at the mismatched
    points (~0.1% of points at 16×16384², aggregate CD shift ~2e-5 rel).
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
    row_bits = max(1, (Mp - 1).bit_length())
    col_bits = max(1, (Npad - 1).bit_length())
    assert row_bits <= 18 and col_bits <= 18, "index packing needs sizes <= 2^18"

    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    xh = x32.astype(jnp.bfloat16)
    xl = (x32 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    yh = y32.astype(jnp.bfloat16)
    yl = (y32 - yh.astype(jnp.float32)).astype(jnp.bfloat16)
    zx = jnp.zeros(xh.shape[:2] + (7,), jnp.bfloat16)
    zy = jnp.zeros(yh.shape[:2] + (7,), jnp.bfloat16)
    A = jnp.concatenate([-2 * xh, -2 * xl, -2 * xh, zx], axis=-1)  # (B, N, 16)
    Bm = jnp.concatenate([yh, yh, yl, zy], axis=-1).transpose(0, 2, 1)
    # pads: coords far away + squared-norm sentinel so padded rows/cols
    # never win either direction
    A = jnp.pad(A, ((0, 0), (0, pad_n), (0, 0)), constant_values=1e4)
    Bm = jnp.pad(Bm, ((0, 0), (0, 0), (0, pad_m)), constant_values=1e4)
    xsq = jnp.sum(x32 * x32, -1, keepdims=True)
    xsq = jnp.pad(xsq, ((0, 0), (0, pad_n), (0, 127)), constant_values=1e18)
    ysq = jnp.sum(y32 * y32, -1, keepdims=True).transpose(0, 2, 1)
    ysq = jnp.pad(ysq, ((0, 0), (0, 0), (0, pad_m)), constant_values=1e18)

    rows = TN // 128
    i1, i2 = pl.pallas_call(
        functools.partial(
            _nn_bidir_mxu_kernel, tm=TM, row_bits=row_bits, col_bits=col_bits
        ),
        grid=(B, Npad // TN),
        in_specs=[
            pl.BlockSpec((None, TN, 16), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 16, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TN, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
        ),
    )(A, Bm, xsq, ysq)
    i1 = jnp.minimum(i1.reshape(B, Npad)[:, :N] & ((1 << row_bits) - 1), M - 1)
    i2 = jnp.minimum(i2.reshape(B, Mp)[:, :M] & ((1 << col_bits) - 1), N - 1)
    return i1, i2


def _knn_kernel(q_ref, r_ref, idx_ref, dist_ref, ts: int, k: int, n_valid_r: int):
    # q_ref: (Sp, 8); r_ref: (8, Mp); outputs (Sp, kpad)
    Sp = q_ref.shape[0]
    Mp = r_ref.shape[1]
    kpad = idx_ref.shape[1]
    s_tiles = Sp // ts

    def stile(st, _):
        sl = pl.ds(pl.multiple_of(st * ts, ts), ts)
        d = _dist_tile(
            q_ref[sl, 0:1], q_ref[sl, 1:2], q_ref[sl, 2:3],
            r_ref[0:1, :], r_ref[1:2, :], r_ref[2:3, :],
        )  # (ts, Mp)
        col = jax.lax.broadcasted_iota(jnp.int32, (ts, Mp), 1)
        d = jnp.where(col < n_valid_r, d, _BIG)
        # peel the k nearest (k is small: 3-32); static column stores
        for j in range(k):
            dmin = jnp.min(d, axis=1, keepdims=True)
            amin = jnp.min(jnp.where(d == dmin, col, Mp), axis=1, keepdims=True)
            idx_ref[sl, j : j + 1] = amin
            dist_ref[sl, j : j + 1] = dmin
            d = jnp.where(col == amin, _BIG, d)
        return 0

    jax.lax.fori_loop(0, s_tiles, stile, 0)


def knn_pallas(k: int, xyz: jax.Array, new_xyz: jax.Array):
    """(sqdist, idx) of the k nearest ``xyz`` per ``new_xyz`` query.

    Ascending order, first-index tie-break (matches the XLA top_k path).
    """
    B, M, _ = xyz.shape
    S = new_xyz.shape[1]
    pad_m128 = (-M) % 128
    Mp0 = M + pad_m128
    # (TS, Mp) distance tile within ~6MB of VMEM
    TS = max(8, min(512, (6 * 1024 * 1024) // (4 * Mp0)))
    TS = (TS // 8) * 8
    pad_s = (-S) % TS
    Sp = S + pad_s
    kpad = k + ((-k) % 128)

    qp = jnp.pad(new_xyz.astype(jnp.float32), ((0, 0), (0, pad_s), (0, 5)))
    rt = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    rt = jnp.pad(rt, ((0, 0), (0, 5), (0, pad_m128)), constant_values=1e9)

    idx, dist = pl.pallas_call(
        functools.partial(_knn_kernel, ts=TS, k=k, n_valid_r=M),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, Sp, 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp0), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, Sp, kpad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Sp, kpad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, kpad), jnp.int32),
            jax.ShapeDtypeStruct((B, Sp, kpad), jnp.float32),
        ),
    )(qp, rt)
    return dist[:, :S, :k], idx[:, :S, :k]
