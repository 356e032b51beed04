"""Pallas farthest-point-sampling kernel.

The XLA fori_loop FPS round-trips the (B, N) min-distance cache through HBM
every iteration; here coordinates and the cache stay in VMEM for the whole
scan. The kernel is batched: each grid program owns a chunk of batch rows
and every iteration updates all of them at once (a per-batch-element grid
would serialize on the single TensorCore).

Semantics identical to ops.pointops.furthest_point_sample (seed index 0,
running-min cache, first-argmax selection — the pointnet2 kernel contract)
up to floating-point ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, out_ref, mind_ref, npoint: int, n_valid: int):
    # xyz_ref: (Bt, 8, N) — channel rows 0..2 = x,y,z; out_ref: (npoint, Bt)
    Bt, _, N = xyz_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, N), 2)
    mind_ref[...] = jnp.where(col < n_valid, 1e10, -jnp.inf).astype(jnp.float32)
    out_ref[0:1, :] = jnp.zeros((1, Bt), jnp.int32)

    x = xyz_ref[:, 0:1, :]
    y = xyz_ref[:, 1:2, :]
    z = xyz_ref[:, 2:3, :]

    def body(i, last):
        # last: (Bt, 1, 1) int32 — index of the previously selected point
        sel = (col == last).astype(jnp.float32)
        px = jnp.sum(sel * x, axis=2, keepdims=True)
        py = jnp.sum(sel * y, axis=2, keepdims=True)
        pz = jnp.sum(sel * z, axis=2, keepdims=True)
        dx = x - px
        dy = y - py
        dz = z - pz
        m = jnp.minimum(mind_ref[...], dx * dx + dy * dy + dz * dz)
        mind_ref[...] = m
        best = jnp.max(m, axis=2, keepdims=True)
        nxt = jnp.min(jnp.where(m == best, col, N), axis=2, keepdims=True)
        # dynamic sublane store: row i of the (npoint, Bt) output
        out_ref[pl.ds(i, 1), :] = nxt[:, 0, :].T.astype(jnp.int32)
        return nxt

    jax.lax.fori_loop(
        1, npoint, body, jnp.zeros((Bt, 1, 1), jnp.int32), unroll=False
    )


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """(B, N, 3) → (B, npoint) int32 FPS indices (TPU Pallas)."""
    B, N, _ = xyz.shape
    pad_n = (-N) % 128
    Np = N + pad_n
    # batch chunk sized to keep coords + cache within ~10MB of VMEM
    Bt = max(1, min(B, (10 * 1024 * 1024) // (9 * Np * 4)))
    pad_b = (-B) % Bt
    Bp = B + pad_b

    xt = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    xt = jnp.pad(xt, ((0, pad_b), (0, 5), (0, pad_n)), constant_values=-1e9)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n_valid=N),
        grid=(Bp // Bt,),
        in_specs=[
            pl.BlockSpec((Bt, 8, Np), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (None, npoint, Bt), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp // Bt, npoint, Bt), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Bt, 1, Np), jnp.float32)],
    )(xt)
    out = out.transpose(0, 2, 1).reshape(Bp, npoint)
    return out[:B]
