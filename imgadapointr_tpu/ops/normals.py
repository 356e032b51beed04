"""Per-point normal estimation via kNN-covariance eigen-decomposition.

Functional equivalent of pytorch3d ``points_normals.estimate_pointcloud_normals``
as used by the reference (models/internal/pctransformer.py:176, :238-244,
:293-299 — always ``k=30, disambiguate_directions=False``): for each point,
the eigenvector of the smallest eigenvalue of the covariance of its k nearest
neighbours (self included). Pure XLA: dense kNN + batched ``eigh`` on 3×3
covariances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pointops import index_points, knn_point


def _smallest_eigvec_sym3x3(A: jax.Array) -> jax.Array:
    """Eigenvector of the smallest eigenvalue of symmetric 3×3 matrices.

    Closed-form (trigonometric eigenvalues + row-cross-product eigenvector)
    instead of ``jnp.linalg.eigh``: the iterative eigh lowering is extremely
    compile-heavy on TPU (observed >10 min inside train graphs); this is a
    handful of VPU ops and fully differentiable.

    A: (..., 3, 3). Returns (..., 3) unit vectors.
    """
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01**2 + a02**2 + a12**2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # B = (A - qI) / p ; r = det(B)/2
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    # Clip STRICTLY inside (-1, 1): arccos' gradient is -1/sqrt(1-r²) → ∞
    # at r = ±1, and |detB/2| saturates exactly there for degenerate
    # (isotropic / two-equal-eigenvalue) neighbourhoods — which mid-training
    # coarse clouds DO produce (collapsed/duplicated points). At the
    # boundary jnp.clip's gradient is 0, so the ∞ never enters the backward;
    # the value shift is ≤ ~1.4e-3 rad of phi and only in the regime where
    # the eigenvector is ill-defined anyway (the fallback below owns it).
    # Caught live in round 4: the seg-superset convergence arm went NaN at
    # epoch 1 without this (point-only/img arms have no normals path).
    r = jnp.clip(detB / 2.0, -1.0 + 1e-6, 1.0 - 1e-6)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest

    # eigenvector: null space of (A - lam I); take the largest of the three
    # pairwise row cross products for numerical robustness
    m = A - lam_min[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    norm = jnp.sqrt(jnp.maximum(jnp.sum(best * best, axis=-1, keepdims=True), 1e-30))
    # degenerate neighbourhoods (isotropic cov, p≈0): fall back to +z
    fallback = jnp.zeros_like(best).at[..., 2].set(1.0)
    degenerate = (norm[..., 0] < 1e-12) | (p < 1e-12)
    return jnp.where(degenerate[..., None], fallback, best / norm)


@functools.partial(jax.jit, static_argnums=(1,))
def estimate_pointcloud_normals(points: jax.Array, k: int = 30) -> jax.Array:
    """(B, N, 3) → (B, N, 3) unit normals (sign not disambiguated)."""
    k = min(k, points.shape[1])
    idx = knn_point(k, points, points)  # (B, N, k), self included
    nbr = index_points(points, idx)  # (B, N, k, 3)
    mean = jnp.mean(nbr, axis=2, keepdims=True)
    # f32 floor for low-precision inputs, but KEEP f64 under x64 — the fp64
    # gradient-parity harness differentiates through this op live
    d = (nbr - mean).astype(jnp.promote_types(points.dtype, jnp.float32))
    # covariance entries are O(r²) differences of near-equal products — a
    # bf16 MXU contraction here visibly tilts the normals; k=30 on 3-wide
    # vectors is VPU-trivial at full precision
    cov = jnp.einsum(
        "bnki,bnkj->bnij", d, d, precision=jax.lax.Precision.HIGHEST
    ) / k  # (B, N, 3, 3)
    return _smallest_eigvec_sym3x3(cov)
