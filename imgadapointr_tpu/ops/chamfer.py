"""Chamfer distance — TPU-native tiled nearest-neighbour distance with custom VJP.

Functional equivalent of the reference CUDA extension
(reference: extensions/chamfer_dist/chamfer.cu:15-229 and
extensions/chamfer_dist/__init__.py:13-110):

- ``nn_distance(x, y) -> (d1, d2, i1, i2)``: per-point squared NN distance and
  argmin index, both directions.
- ``chamfer_l1``: ``(mean(sqrt(d1)) + mean(sqrt(d2))) / 2``
  (reference __init__.py:64-84).
- ``chamfer_l2``: ``mean(d1) + mean(d2)`` (reference __init__.py:28-44).
- ``chamfer_l1_pm`` / ``chamfer_l2_split``: one-sided / split variants
  (reference __init__.py:86-110).

Design: the (B, N, M) distance matrix is never materialised. The forward pass
scans over M in tiles, keeping a running (min, argmin) in registers/VMEM;
peak memory is O(B·N·tile). The backward uses the saved argmin indices:
gather for the own-direction term, batched scatter-add for the cross term —
exactly the gradient the reference CUDA backward computes with atomicAdd
(chamfer.cu:173-229), but deterministic.

The reference's ``ignore_zeros`` flag (drop zero rows when bs==1) becomes an
optional fixed-shape validity mask (``w1``/``w2``), which is the TPU-friendly
generalisation: masked points contribute 0 to both directions.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from ..utils.envflags import env_flag

_TILE = 1024  # M-tile per scan step; peak temp = B*N*TILE floats.

# --sp: when set (trace-time, via points_axis_sharding), the chamfer losses
# route over the ppermute ring of ops/sharded.py with the point dim sharded
# on the context's mesh axis. (mesh, points_axis, batch_axis) or None.
_POINTS_CTX = None


class points_axis_sharding:
    """Context manager: route ``chamfer_l1``/``chamfer_l2`` calls traced
    inside it over the point-axis ring (``ops/sharded.py``), sharding the
    point dimension of both clouds across ``axis`` of ``mesh`` and the batch
    over ``batch_axis``. Used by the runner when ``--sp > 1``: the O(B·N·M)
    distance field — the train step's dominant term at large N — then rides
    ICI instead of living on one chip. Selection stays diff-form exact
    (lowest-global-index ties); losses whose shapes don't divide the axis
    fall back to the unsharded op per call.
    """

    def __init__(self, mesh, axis: str = "points", batch_axis: str | None = "data"):
        self.ctx = (mesh, axis, batch_axis)

    def __enter__(self):
        global _POINTS_CTX
        self._prev = _POINTS_CTX
        _POINTS_CTX = self.ctx
        return self

    def __exit__(self, *exc):
        global _POINTS_CTX
        _POINTS_CTX = self._prev
        return False


def _points_ctx_for(x, y, w1, w2):
    """The active --sp context iff this (x, y) call can ride the ring:
    unmasked, point dims divisible by the axis, batch divisible by the
    batch axis, and each per-device reference block still holds at least
    one point."""
    if _POINTS_CTX is None or w1 is not None or w2 is not None:
        return None
    mesh, axis, batch_axis = _POINTS_CTX
    p = int(mesh.shape[axis])
    if p <= 1 or x.shape[1] % p or y.shape[1] % p:
        return None
    if batch_axis is not None and x.shape[0] % int(mesh.shape[batch_axis]):
        return None
    return mesh, axis, batch_axis


def _pad_to_multiple(y: jax.Array, tile: int) -> tuple[jax.Array, int]:
    m = y.shape[1]
    pad = (-m) % tile
    if pad:
        # Pad with a sentinel far away so padded points never win the argmin.
        y = jnp.pad(y, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    return y, m


def _nn_one_direction(
    x: jax.Array,
    y: jax.Array,
    w2: jax.Array | None,
    tile: int,
    diff_form: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """For each x, squared distance + index of nearest valid y. Tiled over M.

    TPU: Pallas diff-form kernel (VPU speed-of-light for K=3 distances, and
    opaque to the XLA fusion search that otherwise blows up compile times).
    Masked (w2) inputs fall back to the XLA scan path.

    ``diff_form=True`` makes the XLA scan fallback compute per-tile
    distances as ``Σ(x−y)²`` (elementwise, like the Pallas kernels) instead
    of the matmul form ``|x|²−2x·y+|y|²``. The matmul form (even at
    HIGHEST) carries a ~2⁻²⁵·(|x|²+|y|²) cancellation floor that can flip
    near-tie argmin selections — a measured training-convergence hazard
    (benchmarks/RESULTS.md "selection precision is gradient quality").
    ``ops/sharded.py`` forces this so the point-sharded ops select in
    diff-form at EVERY per-block size, independent of the Pallas dispatch
    gate below (whose per-block pair count can fall under 2²² even when
    the global problem is large).
    """
    # size-gated: each distinct-shape pallas_call is a separate remote
    # Mosaic compile; small chamfers stay on the XLA scan path
    if (
        jax.default_backend() == "tpu"
        and w2 is None
        and x.shape[1] * y.shape[1] >= 1 << 22
    ):
        from .pallas.nn_distance import nn_one_direction_pallas

        return nn_one_direction_pallas(x, y)
    y, m_true = _pad_to_multiple(y, tile)
    B, N, _ = x.shape
    M = y.shape[1]
    num_tiles = M // tile

    # accumulate in >= f32: f32 for f32/bf16 inputs, f64 under x64 (the
    # fp64 gradient-parity harness needs the loss path fp64-clean)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(acc_t)
    xsq = jnp.sum(x32 * x32, axis=-1)  # (B, N)

    y_tiles = y.astype(acc_t).reshape(B, num_tiles, tile, 3).transpose(1, 0, 2, 3)
    if w2 is not None:
        w = jnp.pad(w2.astype(acc_t), ((0, 0), (0, M - m_true)))
        w_tiles = w.reshape(B, num_tiles, tile).transpose(1, 0, 2)
    else:
        w_tiles = jnp.ones((num_tiles, B, tile), acc_t)

    def step(carry, inp):
        best_d, best_i, base = carry
        yt, wt = inp  # (B, tile, 3), (B, tile)
        if diff_form:
            # elementwise Σ(x−y)²: no cancellation floor; selection matches
            # the Pallas diff-form kernels (XLA fuses the broadcasted
            # subtract into the reduction — the (B,N,tile,3) temp is virtual)
            d = jnp.sum(
                (x32[:, :, None, :] - yt[:, None, :, :]) ** 2, axis=-1
            )
        else:
            ysq = jnp.sum(yt * yt, axis=-1)  # (B, tile)
            # HIGHEST precision: bf16 matmul error (~5e-3) would dominate
            # small nearest-neighbour distances via the |x|^2 - 2x·y + |y|^2
            # cancellation.
            d = (
                xsq[:, :, None]
                - 2.0
                * jnp.einsum(
                    "bnc,bmc->bnm",
                    x32,
                    yt,
                    preferred_element_type=acc_t,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + ysq[:, None, :]
            )
        d = jnp.where(wt[:, None, :] > 0, d, jnp.inf)
        dmin = jnp.min(d, axis=-1)
        amin = jnp.argmin(d, axis=-1).astype(jnp.int32) + base
        upd = dmin < best_d
        return (
            jnp.where(upd, dmin, best_d),
            jnp.where(upd, amin, best_i),
            base + tile,
        ), None

    # derive the carry init from xsq so shard_map's varying-manual-axes
    # tracking sees consistent types when this runs inside ops/sharded.py
    init = (
        jnp.full_like(xsq, jnp.inf),
        jnp.zeros_like(xsq, dtype=jnp.int32),
        jnp.int32(0),
    )
    (best_d, best_i, _), _ = jax.lax.scan(step, init, (y_tiles, w_tiles))
    best_d = jnp.maximum(best_d, 0.0)  # numerical floor: |x-y|^2 >= 0
    return best_d, best_i


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def nn_distance(
    x: jax.Array,
    y: jax.Array,
    w1: jax.Array | None = None,
    w2: jax.Array | None = None,
    tile: int = _TILE,
):
    """Bidirectional squared NN distance.

    Args:
        x: (B, N, 3). y: (B, M, 3).
        w1: optional (B, N) validity mask for x; invalid x rows get d1=0.
        w2: optional (B, M) validity mask for y; invalid y rows get d2=0 and
            are excluded as neighbour candidates.
        tile: scan tile size over the opposite cloud.
    Returns:
        ``(d1, d2, i1, i2)`` with d1:(B,N) sqdist x→nearest y, i1:(B,N) its
        index, and symmetrically d2/i2:(B,M).
    """
    out, _ = _nn_distance_impl(x, y, w1, w2, tile)
    return out


def _nn_distance_impl(x, y, w1, w2, tile):
    """Shared forward returning ``((d1, d2, i1, i2), (y_at_i1, x_at_i2))``.

    The gathered nearest neighbours are produced HERE (post-barrier) so the
    custom-VJP forward can stash them as residuals and the backward re-uses
    them instead of re-gathering — two (B, 16384)-row gathers saved per
    train step at the paper recipe (measured in the XLA trace).
    """
    # Barrier: without it XLA tries to fuse whatever produced x/y (model
    # reshape/slice chains) into the scan body below, and its fusion search
    # explodes (observed 60-500s compiles). Inputs are tiny; isolation is free.
    x, y = jax.lax.optimization_barrier((x, y))
    import os

    if (
        jax.default_backend() == "tpu"
        and w1 is None
        and w2 is None
        and x.shape[1] * y.shape[1] >= 1 << 22
        and x.shape[1] <= 1 << 18
        and y.shape[1] <= 1 << 18
        and not env_flag("IMGADAPOINTR_DISABLE_FUSED_CHAMFER")
    ):
        # Fused bidirectional Pallas kernel: ONE diff-form pass over the
        # distance tiles yields BOTH argmins (1.7x the two one-direction
        # passes at 16x16384^2), with selection bit-identical to the
        # one-direction Pallas kernels it replaces in this size regime
        # (both diff-form; the XLA scan fallback below computes matmul-form
        # HIGHEST distances, so its near-tie picks can differ — see
        # benchmarks/kernels.py for the parity gate that pins this).
        # Faster matmul-form variants exist (nn_argmin_bidir_mxu,
        # 2.2x again) but their f32 cancellation floor flips near-tie
        # selections on pred≈gt clouds and measurably degrades TRAINING
        # convergence — see the kernel docstrings; keep selection exact.
        from .pallas.nn_distance import nn_argmin_bidir_exact

        i1, i2 = nn_argmin_bidir_exact(x, y)
    else:
        _, i1 = _nn_one_direction(x, y, w2, tile)
        _, i2 = _nn_one_direction(y, x, w1, tile)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(acc_t)
    y32 = y.astype(acc_t)
    # index_points dispatches narrow-table gathers to the Pallas kernels —
    # bit-identical values. Small tables (the coarse cloud's 512-row table
    # gathered at 16384 gt argmins) hit the chunk-probe kernel (~2.8 →
    # ~0.5 ms); the 16384-row fine/gt residual gathers hit the two-level
    # hi/lo kernel (1.14 vs 3.46 ms XLA at 16×16384 rows, C=3).
    from .pointops import index_points

    y_at_i1 = index_points(y32, i1)
    x_at_i2 = index_points(x32, i2)
    d1 = jnp.maximum(jnp.sum((x32 - y_at_i1) ** 2, axis=-1), 0.0)
    d2 = jnp.maximum(jnp.sum((y32 - x_at_i2) ** 2, axis=-1), 0.0)
    if w1 is not None:
        d1 = d1 * w1
    if w2 is not None:
        d2 = d2 * w2
    return (d1, d2, i1, i2), (y_at_i1, x_at_i2)


def _nn_distance_fwd(x, y, w1, w2, tile):
    out, (y_at_i1, x_at_i2) = _nn_distance_impl(x, y, w1, w2, tile)
    _, _, i1, i2 = out
    return out, (x, y, w1, w2, i1, i2, y_at_i1, x_at_i2)


def _scatter_add_rows(n_rows: int, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """Batched ``out[b, idx[b, j]] += vals[b, j]`` with out shape (B, n_rows, C).

    Large narrow scatters dispatch to the Pallas MXU one-hot kernel
    (ops/pallas/scatter_rows.py): per-contribution arithmetic is exact,
    accumulation order differs from the XLA scatter by f32 rounding only —
    convergence-gated like every gradient-path kernel change
    (benchmarks/RESULTS.md harness). Opt-out:
    ``IMGADAPOINTR_DISABLE_PALLAS_SCATTER=1``.
    """
    import os

    if (
        jax.default_backend() == "tpu"
        and vals.dtype == jnp.float32
        and vals.shape[0] * vals.shape[1] >= 1 << 15
        and not env_flag("IMGADAPOINTR_DISABLE_PALLAS_SCATTER")
    ):
        # gate thresholds live with the kernel so dispatch and VMEM
        # budget can never drift apart
        from .pallas.scatter_rows import MAX_C, MAX_M, scatter_add_rows_pallas

        if n_rows <= MAX_M and vals.shape[-1] <= MAX_C:
            return scatter_add_rows_pallas(n_rows, idx, vals)

    def one(i, v):
        return jnp.zeros((n_rows, v.shape[-1]), v.dtype).at[i].add(v)

    return jax.vmap(one)(idx, vals)


def _nn_distance_bwd(tile, res, grads):
    x, y, w1, w2, i1, i2, y_at_i1, x_at_i2 = res
    g1, g2, _, _ = grads  # cotangents of d1, d2 (indices are int outputs)
    if w1 is not None:
        g1 = g1 * w1
    if w2 is not None:
        g2 = g2 * w2

    # d1 = |x - y[i1]|^2  →  ∂/∂x = 2(x - y[i1]) g1 ; ∂/∂y[i1] -= same
    gx_own = 2.0 * (x - y_at_i1) * g1[..., None]
    gy_own = 2.0 * (y - x_at_i2) * g2[..., None]
    gx = gx_own + _scatter_add_rows(x.shape[1], i2, -gy_own)
    gy = gy_own + _scatter_add_rows(y.shape[1], i1, -gx_own)
    # cotangent pytree must match the primal inputs: zero grads for array
    # masks, None only when the primal mask was None
    gw1 = None if w1 is None else jnp.zeros_like(w1)
    gw2 = None if w2 is None else jnp.zeros_like(w2)
    return gx.astype(x.dtype), gy.astype(y.dtype), gw1, gw2


nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def chamfer_l1(x, y, w1=None, w2=None):
    """CD-L1: ``(mean(sqrt(d1)) + mean(sqrt(d2))) / 2``.

    With masks, per-direction means divide by the number of *valid* points.
    Reference: extensions/chamfer_dist/__init__.py:64-84.
    """
    ctx = _points_ctx_for(x, y, w1, w2)
    if ctx is not None:
        from .sharded import sharded_chamfer_l1

        mesh, axis, batch_axis = ctx
        return sharded_chamfer_l1(x, y, mesh, axis=axis, batch_axis=batch_axis)
    d1, d2, _, _ = nn_distance(x, y, w1, w2)
    s1 = jnp.sqrt(jnp.maximum(d1, 1e-24))
    s2 = jnp.sqrt(jnp.maximum(d2, 1e-24))
    return (_masked_mean(s1, w1) + _masked_mean(s2, w2)) / 2.0


def chamfer_l2(x, y, w1=None, w2=None):
    """CD-L2: ``mean(d1) + mean(d2)`` (reference __init__.py:28-44)."""
    ctx = _points_ctx_for(x, y, w1, w2)
    if ctx is not None:
        from .sharded import sharded_chamfer_l2

        mesh, axis, batch_axis = ctx
        return sharded_chamfer_l2(x, y, mesh, axis=axis, batch_axis=batch_axis)
    d1, d2, _, _ = nn_distance(x, y, w1, w2)
    return _masked_mean(d1, w1) + _masked_mean(d2, w2)


def chamfer_l2_split(x, y, w1=None, w2=None):
    """Split CD-L2 returning ``(mean(d1), mean(d2))`` (reference __init__.py:46-63)."""
    d1, d2, _, _ = nn_distance(x, y, w1, w2)
    return _masked_mean(d1, w1), _masked_mean(d2, w2)


def chamfer_l1_pm(x, y, w1=None, w2=None):
    """One-sided (partial-matching) CD-L1: ``mean(sqrt(d1))``
    (reference __init__.py:86-110)."""
    d1, _, _, _ = nn_distance(x, y, w1, w2)
    return _masked_mean(jnp.sqrt(jnp.maximum(d1, 1e-24)), w1)


def _masked_mean(v: jax.Array, w: jax.Array | None) -> jax.Array:
    if w is None:
        return jnp.mean(v)
    w = w.astype(v.dtype)
    return jnp.sum(v * w) / jnp.maximum(jnp.sum(w), 1.0)


def mxu_eval_chamfer_active(n: int, m: int) -> bool:
    """True iff :func:`nn_distance_eval` takes the opt-in MXU selection
    kernel for (N, M)-point clouds on the current backend — the single
    source of truth for that gate. tools/runner.py's ``--test`` paths use
    it to decide whether the eval suite's F-score carries the MXU
    selection band (recompute exactly) or is the exact value (reuse —
    skipping a second full O(N·M) pass). Read at trace time: shapes are
    static under jit and the env flip would otherwise silently keep a
    stale cached graph."""
    return bool(
        jax.default_backend() == "tpu"
        and n * m >= 1 << 22
        and n <= 1 << 18
        and m <= 1 << 18
        and env_flag("IMGADAPOINTR_ENABLE_MXU_EVAL_CHAMFER")
    )


def nn_distance_eval(x: jax.Array, y: jax.Array):
    """Bidirectional squared NN distances — **EVAL METRICS ONLY**.

    Same contract as :func:`nn_distance` (d1, d2, i1, i2). By default this
    IS the exact path: the round-3 re-measurement of the MXU matmul-form
    selection kernel (benchmarks/kernels.py) found it only 1.16× faster
    than the exact diff-form kernel at 16×16384² (34.6 vs 40.3 ms) — both
    kernels are bound by the O(N·M) VPU min/argmin bookkeeping, not the
    distance arithmetic the MXU accelerates — with a measured selection
    band of ~4e-4..1.1e-3 (sqrt-abs, dense unit clouds), wider than the
    ~2e-5 the round-2 experiment recorded. 16% for a banded selection is a
    bad trade even for metrics, so the MXU kernel is opt-in
    (``IMGADAPOINTR_ENABLE_MXU_EVAL_CHAMFER=1``); distance VALUES are
    recomputed exactly from the selected indices either way, and the
    x1000-CD delta stays < 1e-3 (gated in benchmarks/kernels.py).

    The eval-side win that DOES pay is upstream: ``eval_metric_suite``
    derives CD-L1 + CD-L2 + F-score from ONE pass through here instead of
    three separate full passes.

    NEVER route training losses through this entry: kept separate so any
    future approximate-selection eval kernel can never leak into
    ``models/losses.py`` (tests/test_round3_fixes.py pins that), where
    selection precision is gradient quality (RESULTS.md negative results).

    Non-differentiable by design (stop_gradient on the inputs): metrics
    never need tangents and the Pallas kernels have no JVP rule.
    """
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    if mxu_eval_chamfer_active(x.shape[1], y.shape[1]):
        from .pallas.nn_distance import nn_argmin_bidir_mxu

        i1, i2 = nn_argmin_bidir_mxu(x, y)
        x32 = x.astype(jnp.float32)
        y32 = y.astype(jnp.float32)
        y_at_i1 = jnp.take_along_axis(y32, i1[..., None], axis=1)
        x_at_i2 = jnp.take_along_axis(x32, i2[..., None], axis=1)
        d1 = jnp.maximum(jnp.sum((x32 - y_at_i1) ** 2, axis=-1), 0.0)
        d2 = jnp.maximum(jnp.sum((y32 - x_at_i2) ** 2, axis=-1), 0.0)
        return d1, d2, i1, i2
    return nn_distance(x, y)
