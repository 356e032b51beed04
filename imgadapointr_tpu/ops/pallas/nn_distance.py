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
matmul form (no bf16 issue at all). This is load-bearing for TRAINING, not
just metrics: matmul-form |x|²-2x·y+|y|² carries a ~2⁻²⁵·(|x|²+|y|²)
absolute error floor from f32 cancellation, which on pred≈gt clouds flips
~0.7% of nearest-neighbour selections and measurably slows convergence
(synthetic A/B at epoch 20: CD-L1 15.2 matmul-exact-argmin / 16.8
packed-argmin vs 12.3 diff-form). MXU offload of the cross term is
therefore intentionally NOT used for chamfer argmin selection.
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


def _nn_bidir_exact_kernel(x_ref, y_ref, rowidx_ref, colidx_ref, colmin_ref, tm: int):
    """Bidirectional argmin, diff-form distances, EXACT selection.

    One pass over the (TN, TM) distance tiles serves BOTH chamfer
    directions: the row direction keeps a running (min, first-index argmin)
    in registers; the column direction accumulates (min, argmin) into
    output blocks that revisit the same slot across the sequential n grid.

    Numerics are IDENTICAL to the one-direction kernel / XLA scan path:
    diff-form fp32 ``dx²+dy²+dz²`` has no cancellation floor, unlike any
    matmul formulation of ``|x|²-2x·y+|y|²`` whose f32 sums carry a
    ~2⁻²⁵·(|x|²+|y|²) absolute error — on trained-model clouds (pred ≈ gt,
    NN gaps ~1e-8) that flipped ~0.7% of selections and measurably slowed
    training convergence even with an exact argmin dance on the erroneous
    distances (synthetic A/B: CD-L1 15.2 vs 12.3 at epoch 20; a
    quantized-selection variant was worse still at 16.8).
    """
    tn = x_ref.shape[0]
    Mp = y_ref.shape[1]
    m_chunks = Mp // tm
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        colmin_ref[...] = jnp.full(colmin_ref.shape, _BIG)
        colidx_ref[...] = jnp.zeros(colidx_ref.shape, jnp.int32)

    xx = x_ref[:, 0:1]
    xy = x_ref[:, 1:2]
    xz = x_ref[:, 2:3]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 0) + n * tn
    IBIG = jnp.int32(0x7FFFFFFF)

    def chunk(ci, carry):
        best_d, best_i = carry
        ms = pl.ds(pl.multiple_of(ci * tm, tm), tm)
        d = _dist_tile(xx, xy, xz, y_ref[0:1, ms], y_ref[1:2, ms], y_ref[2:3, ms])
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + ci * tm
        cmin = jnp.min(d, axis=1, keepdims=True)
        camin = jnp.min(jnp.where(d == cmin, col, IBIG), axis=1, keepdims=True)
        upd = cmin < best_d
        best_d = jnp.where(upd, cmin, best_d)
        best_i = jnp.where(upd, camin, best_i)
        dmin_c = jnp.min(d, axis=0, keepdims=True)
        amin_c = jnp.min(jnp.where(d == dmin_c, row_ids, IBIG), axis=0, keepdims=True)
        prev = colmin_ref[0:1, ms]
        updc = dmin_c < prev
        colmin_ref[0:1, ms] = jnp.where(updc, dmin_c, prev)
        colidx_ref[0:1, ms] = jnp.where(updc, amin_c, colidx_ref[0:1, ms])
        return best_d, best_i

    init = (jnp.full((tn, 1), _BIG), jnp.zeros((tn, 1), jnp.int32))
    _, best_i = jax.lax.fori_loop(0, m_chunks, chunk, init)
    rowidx_ref[...] = best_i.reshape(tn // 128, 128)


def nn_argmin_bidir_exact(
    x: jax.Array, y: jax.Array, tile_n: int = 1024, tile_m: int = 1024
):
    """(i1, i2): nearest-y per x AND nearest-x per y, one diff-form pass.

    Bit-identical distances and first-index tie-breaks vs the scan path —
    the training-safe fused kernel (see the kernel docstring for why the
    faster matmul-form variants are not).
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

    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 5)), constant_values=1e9
    )
    yt = jnp.transpose(y.astype(jnp.float32), (0, 2, 1))
    yt = jnp.pad(yt, ((0, 0), (0, 5), (0, pad_m)), constant_values=1e9)

    rows = TN // 128
    i1, i2, _ = pl.pallas_call(
        functools.partial(_nn_bidir_exact_kernel, tm=TM),
        grid=(B, Npad // TN),
        in_specs=[
            pl.BlockSpec((None, TN, 8), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.float32),
        ),
    )(xp, yt)
    i1 = jnp.minimum(i1.reshape(B, Npad)[:, :N], M - 1)
    i2 = jnp.minimum(i2.reshape(B, Mp)[:, :M], N - 1)
    return i1, i2


def _nn_bidir_mxu_kernel(
    x_ref, y_ref, xsq_ref, ysq_ref, rowidx_ref, colidx_ref, colmin_ref, tm: int
):
    """Bidirectional argmin with MXU matmul-form distances — EVAL ONLY.

    ``d̃ = |x|² − 2·x·y + |y|²`` with the cross term as a 3-way bf16 hi-lo
    split accumulated in f32 (x·y exact to ~2⁻²⁴·|x||y|). The remaining
    ~2⁻²⁵·(|x|²+|y|²) cancellation floor of the f32 sums puts selection in a
    ~2e-5 relative band around the true argmin on dense unit clouds —
    METRIC-safe (CD means move <1e-6 relative when the caller recomputes
    exact distances from the returned indices) but TRAIN-unsafe: on pred≈gt
    clouds the band flips near-tie selections and measurably slows
    convergence (benchmarks/RESULTS.md "Negative results": CD-L1 15.2 vs
    12.3 at epoch 20). Reachable only through ops.chamfer.nn_distance_eval;
    the loss path keeps the diff-form exact kernels.
    """
    tn = x_ref.shape[0]
    Mp = y_ref.shape[1]
    m_chunks = Mp // tm
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        colmin_ref[...] = jnp.full(colmin_ref.shape, _BIG)
        colidx_ref[...] = jnp.zeros(colidx_ref.shape, jnp.int32)

    x32 = x_ref[...]  # (TN, 8), coord cols 0:3, zero-padded cols
    x_hi = x32.astype(jnp.bfloat16)
    x_lo = (x32 - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xsq = xsq_ref[...]  # (TN, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 0) + n * tn
    IBIG = jnp.int32(0x7FFFFFFF)

    def chunk(ci, carry):
        best_d, best_i = carry
        ms = pl.ds(pl.multiple_of(ci * tm, tm), tm)
        yt = y_ref[:, ms]  # (8, tm) f32
        y_hi = yt.astype(jnp.bfloat16)
        y_lo = (yt - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cross = (
            jnp.dot(x_hi, y_hi, preferred_element_type=jnp.float32)
            + jnp.dot(x_hi, y_lo, preferred_element_type=jnp.float32)
            + jnp.dot(x_lo, y_hi, preferred_element_type=jnp.float32)
        )
        d = xsq - 2.0 * cross + ysq_ref[0:1, ms]
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + ci * tm
        cmin = jnp.min(d, axis=1, keepdims=True)
        camin = jnp.min(jnp.where(d == cmin, col, IBIG), axis=1, keepdims=True)
        upd = cmin < best_d
        best_d = jnp.where(upd, cmin, best_d)
        best_i = jnp.where(upd, camin, best_i)
        dmin_c = jnp.min(d, axis=0, keepdims=True)
        amin_c = jnp.min(jnp.where(d == dmin_c, row_ids, IBIG), axis=0, keepdims=True)
        prev = colmin_ref[0:1, ms]
        updc = dmin_c < prev
        colmin_ref[0:1, ms] = jnp.where(updc, dmin_c, prev)
        colidx_ref[0:1, ms] = jnp.where(updc, amin_c, colidx_ref[0:1, ms])
        return best_d, best_i

    init = (jnp.full((tn, 1), _BIG), jnp.zeros((tn, 1), jnp.int32))
    _, best_i = jax.lax.fori_loop(0, m_chunks, chunk, init)
    rowidx_ref[...] = best_i.reshape(tn // 128, 128)


def nn_argmin_bidir_mxu(
    x: jax.Array, y: jax.Array, tile_n: int = 1024, tile_m: int = 1024
):
    """(i1, i2) via MXU matmul-form distances — EVAL-METRICS ONLY.

    ~2e-5 relative selection band (see kernel docstring); callers must
    recompute exact distances from the indices. Never use for training.
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

    # coords zero-padded in the extra COLUMNS (so the 8-dim matmul equals
    # the 3-dim cross term); out-of-range ROWS get 1e9 coords so their
    # distances are huge and never win the opposite direction's argmin
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 5)))
    if pad_n:
        row = jnp.arange(Npad)[None, :, None]
        xp = jnp.where(row < N, xp, jnp.where(jnp.arange(8) < 3, 1e9, 0.0))
    yt = jnp.transpose(y.astype(jnp.float32), (0, 2, 1))
    yt = jnp.pad(yt, ((0, 0), (0, 5), (0, 0)))
    if pad_m:
        colv = jnp.arange(Mp)[None, None, :]
        yt = jnp.pad(yt, ((0, 0), (0, 0), (0, pad_m)))
        yt = jnp.where(
            colv < M, yt, jnp.where(jnp.arange(8)[None, :, None] < 3, 1e9, 0.0)
        )
    xsq = jnp.sum(xp[..., :3] * xp[..., :3], axis=-1, keepdims=True)  # (B, Npad, 1)
    ysq = jnp.sum(yt[:, :3] * yt[:, :3], axis=1, keepdims=True)  # (B, 1, Mp)

    rows = TN // 128
    i1, i2, _ = pl.pallas_call(
        functools.partial(_nn_bidir_mxu_kernel, tm=TM),
        grid=(B, Npad // TN),
        in_specs=[
            pl.BlockSpec((None, TN, 8), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TN, 1), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, rows, 128), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Mp), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Npad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.float32),
        ),
    )(xp, yt, xsq, ysq)
    i1 = jnp.minimum(i1.reshape(B, Npad)[:, :N], M - 1)
    i2 = jnp.minimum(i2.reshape(B, Mp)[:, :M], N - 1)
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


def _three_interp_kernel(
    q_ref, r_ref, f_ref, out_ref, idx_ref, w_ref, n_valid_r: int, eps: float
):
    """Fused 3-NN + inverse-distance interpolation (one query tile).

    (TS, Mp) diff-form distances in VMEM, peel the 3 nearest (exact
    selection, first-index ties — same arithmetic as ``_knn_kernel``),
    reciprocal-of-euclidean weights, then emit the interpolated features as
    ONE matmul ``W @ feats`` where W is the (TS, Mp) sparse weight-row
    matrix (3 nonzeros/row) — replacing the (B, S, 3, C) gather
    materialisation of the XLA chain. Weights/feats contract at HIGHEST
    precision (activations; bf16 noise here is a training-dynamics risk
    per RESULTS.md).
    """
    ts = q_ref.shape[0]
    Mp = r_ref.shape[1]
    d = _dist_tile(
        q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3],
        r_ref[0:1, :], r_ref[1:2, :], r_ref[2:3, :],
    )  # (ts, Mp)
    col = jax.lax.broadcasted_iota(jnp.int32, (ts, Mp), 1)
    d = jnp.where(col < n_valid_r, d, _BIG)
    dmins = []
    amins = []
    for _ in range(3):
        dmin = jnp.min(d, axis=1, keepdims=True)
        amin = jnp.min(jnp.where(d == dmin, col, Mp), axis=1, keepdims=True)
        dmins.append(dmin)
        amins.append(amin)
        d = jnp.where(col == amin, _BIG, d)
    recips = [1.0 / (jnp.sqrt(jnp.maximum(dm, 0.0)) + eps) for dm in dmins]
    norm = recips[0] + recips[1] + recips[2]
    ws = [r / norm for r in recips]
    W = jnp.zeros((ts, Mp), jnp.float32)
    for am, w in zip(amins, ws):
        W = W + jnp.where(col == am, w, 0.0)
    out_ref[...] = jax.lax.dot(
        W, f_ref[...], precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    for j, (am, w) in enumerate(zip(amins, ws)):
        idx_ref[:, j : j + 1] = am
        w_ref[:, j : j + 1] = w


def three_nn_interpolate_pallas(
    unknown: jax.Array,
    known: jax.Array,
    feats: jax.Array,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """(out (B,S,C), idx (B,S,3), weight (B,S,3)) — fused forward.

    idx/weight are returned for the custom VJP (the backward scatters
    ``w·g`` into the feature rows exactly like the XLA path).
    """
    B, M, _ = known.shape
    S = unknown.shape[1]
    C = feats.shape[-1]
    pad_m = (-M) % 128
    Mp = M + pad_m
    pad_c = (-C) % 128
    Cp = C + pad_c
    # Scoped-VMEM budget per query row: the kernel's live set is several
    # (TS, Mp) f32 buffers (distance tile, col iota, select/where temps, the
    # sparse W matrix) plus the (TS, Cp) out tile and (TS, 128)×2 idx/w —
    # measured ~16.1 KB/row at Mp=640/Cp=256 (TS=1024 overflowed the 16 MB
    # scoped limit by 488 KB). Budget 12 MB at a conservative 8·Mp+3·Cp
    # f32/row so every gated shape (M ≤ 4096, C ≤ 1024) fits with slack.
    TS = max(8, min(512, (12 * 1024 * 1024) // (4 * (8 * Mp + 3 * Cp))))
    TS = (TS // 8) * 8
    pad_s = (-S) % TS
    Sp = S + pad_s

    qp = jnp.pad(unknown.astype(jnp.float32), ((0, 0), (0, pad_s), (0, 5)))
    rt = jnp.transpose(known.astype(jnp.float32), (0, 2, 1))
    rt = jnp.pad(rt, ((0, 0), (0, 5), (0, pad_m)), constant_values=1e9)
    fp = jnp.pad(feats.astype(jnp.float32), ((0, 0), (0, pad_m), (0, pad_c)))
    kpad = 128  # lane-width padding for the (TS, 3) idx/weight outputs

    out, idx, w = pl.pallas_call(
        functools.partial(_three_interp_kernel, n_valid_r=M, eps=eps),
        grid=(B, Sp // TS),
        in_specs=[
            pl.BlockSpec((None, TS, 8), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Mp, Cp), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, TS, Cp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TS, kpad), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TS, kpad), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((B, Sp, kpad), jnp.int32),
            jax.ShapeDtypeStruct((B, Sp, kpad), jnp.float32),
        ),
        interpret=interpret,
    )(qp, rt, fp)
    return (
        out[:, :S, :C],
        jnp.minimum(idx[:, :S, :3], M - 1),
        w[:, :S, :3],
    )


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
