"""Pallas batched row gather: ``out[b, s, :] = table[b, idx[b, s], :]``.

XLA's TPU row gather is ROW-RATE bound (~170M rows/s regardless of row
width), so the narrow gathers this framework lives on — kNN neighbour
features in the DGCNN grouper (C=3..64, reference models/base_blocks.py:
565-588), coarse-center lookups in the rebuild heads — cost milliseconds
for megabytes. Round-3 eval trace: the grouper layer-1 edge gather alone
(1M rows × 8 ch at bs32) was 6.0 ms of a 48 ms step.

This kernel keeps the whole per-sample table in VMEM (transposed once into
scratch on the first grid step) and gathers with the VPU's intra-register
dynamic lane shuffle (``jnp.take_along_axis`` on a 128-lane tile — the one
dynamic-gather form Mosaic supports; the sublane form compiles but returns
WRONG data, so everything here is built on lane gathers). Each 128-query
group probes every 128-row chunk of the table with one lane-gather +
select; work is O(S · M/128) vreg ops, measured ~15 ns per probe:

    (B32, M2048, C8, S32768):  1.9 ms vs 6.0-8.4 ms XLA  (the L1 shape)
    (B16, M2048, C3, S32768):  ~1.0 ms vs 2.9 ms XLA     (train commuted L1)
    (B32, M512,  C64, S8192):  ~1.3 ms vs 3.3 ms XLA

Selection is EXACT (a pure permutation of input rows — bit-identical to
``jnp.take_along_axis``), so none of the selection-precision caveats of
the distance kernels apply. Gated to M ≤ 4096 (the chunk-probe loop is
unrolled; beyond ~32 chunks XLA's row rate wins anyway) and C ≤ 128.

The custom VJP scatters the cotangent back with the same deterministic
XLA scatter-add the ``take_along_axis`` autodiff emits — gradients are
bit-identical to the XLA path (covered by the frozen gradient goldens).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# hard caps for the unrolled chunk-probe loop / VMEM table residency
MAX_M = 4096
MAX_C = 128

# the two-level (hi/lo) kernel below extends coverage to M ≤ 128·128 for
# narrow rows (the chamfer-residual gathers: 16384-row tables, C=3)
MAX_M_HILO = 16384
MAX_C_HILO = 8


def _gather_kernel(t_ref, idx_ref, out_ref, scratch, G: int, SU: int):
    """One (TS=SU·128)-query block: probe all G 128-row chunks per subtile.

    t_ref: (Mp, Cp) channels-last table block (same block every grid step);
    scratch: (Cp, Mp) — the table transposed once per batch element (the
    lane gather needs the gathered dim on LANES). idx_ref: (1, TS);
    out_ref: (TS, Cp).
    """
    C = scratch.shape[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        scratch[...] = t_ref[...].T

    for u in range(SU):
        sl = slice(u * 128, (u + 1) * 128)
        idxb = jnp.broadcast_to(idx_ref[0:1, sl], (C, 128))
        local = jnp.bitwise_and(idxb, 127)
        grp = jnp.right_shift(idxb, 7)
        acc = jnp.zeros((C, 128), t_ref.dtype)
        for g in range(G):
            part = jnp.take_along_axis(
                scratch[:, g * 128 : (g + 1) * 128], local, axis=1
            )
            acc = jnp.where(grp == g, part, acc)
        out_ref[sl, :] = acc.T


def _gather_hilo_kernel(u_ref, idx_ref, out_ref, G: int, SU: int, C: int):
    """Two-level gather for big tables: idx = hi·128 + lo.

    The chunk-probe loop of `_gather_kernel` is O(M/128) passes per query
    subtile — at M=16384 that is 128 probes and XLA's row rate wins. This
    kernel replaces the probe loop with TWO passes regardless of M:

      u_ref: (C, G, 128) table laid out [channel, hi, lo] (lo on LANES);
      1. lane-gather along lo (index tile constant across sublanes — the
         proven dynamic-shuffle form): g[h, q] = u[c, h, lo_q];
      2. select sublane hi_q per query via a one-hot mask + sublane
         reduction (exactly one nonzero per column, so the f32 sum is the
         selected value EXACTLY — still a pure permutation of input rows).

    idx_ref: (1, TS); out_ref: (TS, C).
    """
    for u in range(SU):
        sl = slice(u * 128, (u + 1) * 128)
        idxq = idx_ref[0:1, sl]
        lo = jnp.broadcast_to(jnp.bitwise_and(idxq, 127), (G, 128))
        hi = jnp.broadcast_to(jnp.right_shift(idxq, 7), (G, 128))
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
        onehot = (iota_h == hi).astype(u_ref.dtype)
        cols = []
        for c in range(C):
            g = jnp.take_along_axis(u_ref[c], lo, axis=1)  # (G, 128)
            cols.append(jnp.sum(g * onehot, axis=0))  # (128,) exact select
        cols += [cols[0]] * (out_ref.shape[1] - C)  # pad channels (sliced off)
        out_ref[sl, :] = jnp.stack(cols, axis=0).T


def _fwd_impl_hilo(table: jax.Array, idx: jax.Array, interpret: bool = False):
    B, M, C = table.shape
    S = idx.shape[1]
    Mp = M + (-M) % 128
    G = Mp // 128
    Cp = C + (-C) % 8
    Sp = S + (-S) % 128
    TS = min(512, Sp)  # modest subtile count: the per-subtile live set is
    # several (G, 128) tiles (scoped-VMEM lesson, see ops/pallas/gather_sum.py)
    Sp = Sp + (-Sp) % TS

    tabp = jnp.pad(table, ((0, 0), (0, Mp - M), (0, Cp - C)))
    u = tabp.reshape(B, G, 128, Cp).transpose(0, 3, 1, 2)  # (B, Cp, G, 128)
    idxp = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, Sp - S))).reshape(B, 1, Sp)

    out = pl.pallas_call(
        functools.partial(
            _gather_hilo_kernel, G=G, SU=TS // 128, C=C
        ),
        grid=(B, Sp // TS),
        in_specs=[
            pl.BlockSpec(
                (None, Cp, G, 128),
                lambda b, s: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, TS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, TS, Cp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Cp), table.dtype),
        interpret=interpret,
    )(u, idxp)
    return out[:, :S, :C]


def _fwd_impl(table: jax.Array, idx: jax.Array, interpret: bool = False):
    # XLA gather CLAMPS out-of-range indices into [0, M-1]; the kernels would
    # instead return zero rows (no chunk probe / one-hot matches). Clamp here
    # so sentinel-index callers see identical behaviour on every backend.
    idx = jnp.clip(idx, 0, table.shape[1] - 1)
    if table.shape[1] > MAX_M:  # big-table regime → two-level hi/lo kernel
        if table.shape[1] > MAX_M_HILO or table.shape[2] > MAX_C_HILO:
            # beyond every kernel regime (direct gather_rows_pallas callers
            # can pass shapes pointops' gate never routes here): plain XLA
            # gather — same semantics, no Mosaic VMEM blow-up on huge tiles
            return jnp.take_along_axis(table, idx[..., None], axis=1)
        return _fwd_impl_hilo(table, idx, interpret)
    if table.shape[2] > MAX_C:
        # wide channels in the probe regime: the (Mp, Cp) table block plus
        # the (Cp, Mp) transposed scratch exceed Mosaic's 16 MB scoped VMEM
        # (and wide gathers measured faster on XLA anyway — module docstring)
        return jnp.take_along_axis(table, idx[..., None], axis=1)
    B, M, C = table.shape
    S = idx.shape[1]
    Cp = C + (-C) % 8
    Mp = M + (-M) % 128
    Sp = S + (-S) % 128
    TS = min(1024, Sp)
    Sp = Sp + (-Sp) % TS

    tabp = jnp.pad(table, ((0, 0), (0, Mp - M), (0, Cp - C)))
    # padded queries read row 0 (any in-range row); their outputs are sliced off
    idxp = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, Sp - S))).reshape(B, 1, Sp)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, G=Mp // 128, SU=TS // 128),
        grid=(B, Sp // TS),
        in_specs=[
            pl.BlockSpec((None, Mp, Cp), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, TS), lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TS, Cp), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Cp), table.dtype),
        scratch_shapes=[pltpu.VMEM((Cp, Mp), table.dtype)],
        interpret=interpret,
    )(tabp, idxp)
    return out[:, :S, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_pallas(table: jax.Array, idx: jax.Array, interpret: bool = False):
    """out (B, S, C) = table[b, idx[b, s], :] — bit-identical to
    ``jnp.take_along_axis(table, idx[..., None], axis=1)``; gradient flows
    to ``table`` via the same deterministic scatter-add."""
    return _fwd_impl(table, idx, interpret)


def _gr_fwd(table, idx, interpret):
    # `table` is saved only for its shape/dtype (zeros_like) — XLA DCEs the
    # value, so this does not extend the table's liveness.
    return _fwd_impl(table, idx, interpret), (idx, table)


def _gr_bwd(interpret, res, g):
    import numpy as np

    idx, table = res
    # the exact scatter-add XLA's take_along_axis VJP emits (clamped like
    # the forward gather, so OOB cotangents land on the clamped row too)
    idx = jnp.clip(idx, 0, table.shape[1] - 1)
    dtable = jax.vmap(lambda d, i, gg: d.at[i].add(gg))(
        jnp.zeros_like(table, dtype=g.dtype), idx, g
    )
    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)  # int primal
    return dtable.astype(table.dtype), didx


gather_rows_pallas.defvjp(_gr_fwd, _gr_bwd)
