"""Differentiable point↔voxel gridding ops (pure XLA).

Functional equivalents of the reference CUDA extensions:
- ``gridding``            → extensions/gridding/gridding.cu:29 +
  __init__.py:34-48: rasterise a cloud onto a scale³ vertex grid with
  trilinear ``1-|Δ|`` corner weights (scatter-add over the 8 cell corners).
- ``gridding_reverse``    → extensions/gridding/gridding_reverse.cu:30 +
  __init__.py:51-74: grid → scale³ points via the corner-weight centroid.
- ``cubic_feature_sampling`` → extensions/cubic_feature_sampling/*.cu:30:
  per point, gather the features of the (2·ns)³ surrounding voxel vertices
  (0 outside the grid).
- ``gridding_distance`` / ``gridding_loss`` → extensions/gridding_loss:
  rasterise pred & gt onto a shared grid with a per-corner 8-slot layout;
  loss = Σ alpha·L1.

All forward passes are built from differentiable jnp ops (the corner weights
are smooth in the point coordinates; cell indices are stop-gradiented), so
JAX autodiff reproduces the reference's hand-written backward kernels — but
deterministically (the CUDA versions scatter with atomicAdd).

The reference strips zero-padded rows (``non_zeros``) per sample; here the
fixed-shape equivalent is a weight-0 mask on zero rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-4  # gridding_reverse.cu EPS


def _corner_data(pts):
    """Shared trilinear corner machinery.

    Returns (corners (B,N,8,3) int lattice coords, weights (B,N,8)), with
    the CUDA kernels' corner ordering: LLL, LLU, LUL, LUU, ULL, ULU, UUL, UUU.
    """
    lower = jnp.floor(pts)
    upper = lower + 1.0  # CUDA bumps upper when lower==upper
    lo = jax.lax.stop_gradient(lower)
    up = jax.lax.stop_gradient(upper)
    # weight relative to each bound: 1 - |x - x0|
    wl = 1.0 - jnp.abs(pts - lo)  # (B, N, 3)
    wu = 1.0 - jnp.abs(pts - up)
    corners = []
    weights = []
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                c = jnp.stack(
                    [
                        jnp.where(cx, up[..., 0], lo[..., 0]),
                        jnp.where(cy, up[..., 1], lo[..., 1]),
                        jnp.where(cz, up[..., 2], lo[..., 2]),
                    ],
                    axis=-1,
                )
                w = (
                    (wu[..., 0] if cx else wl[..., 0])
                    * (wu[..., 1] if cy else wl[..., 1])
                    * (wu[..., 2] if cz else wl[..., 2])
                )
                corners.append(c)
                weights.append(w)
    return jnp.stack(corners, axis=2).astype(jnp.int32), jnp.stack(weights, axis=2)


def _nonzero_mask(ptcloud):
    """1 for real rows, 0 for zero-padded rows (reference ``non_zeros``)."""
    return (jnp.sum(jnp.abs(ptcloud), axis=-1) > 0).astype(ptcloud.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def gridding(ptcloud: jax.Array, scale: int) -> jax.Array:
    """(B, N, 3) cloud in [-1, 1] → (B, scale, scale, scale) density grid.

    Reference Gridding module: cloud × (scale//2), vertices spanning
    [-scale//2, scale//2 - 1] per axis.
    """
    half = scale // 2
    pts = ptcloud * half
    mask = _nonzero_mask(ptcloud)
    corners, weights = _corner_data(pts)
    weights = weights * mask[..., None]
    idx = corners + half  # offset into [0, scale)
    valid = jnp.all((idx >= 0) & (idx < scale), axis=-1)
    flat = (idx[..., 0] * scale + idx[..., 1]) * scale + idx[..., 2]
    flat = jnp.where(valid, flat, 0)
    weights = jnp.where(valid, weights, 0.0)

    def scatter_one(f, w):
        return jnp.zeros((scale**3,), w.dtype).at[f.reshape(-1)].add(w.reshape(-1))

    grid = jax.vmap(scatter_one)(flat, weights)
    return grid.reshape(-1, scale, scale, scale)


@functools.partial(jax.jit, static_argnums=(1,))
def gridding_reverse(grid: jax.Array, scale: int) -> jax.Array:
    """(B, scale³) or (B, s, s, s) grid → (B, scale³, 3) cloud in ~[-1, 1].

    Per cell (x,y,z), the centroid of its 8 lower-corner weights
    (gridding_reverse.cu:30-103); cells on the 0-boundary or with weight
    sum < EPS yield (0,0,0). Output divided by scale·2 per the reference
    wrapper (__init__.py:67-74).
    """
    B = grid.shape[0]
    g = grid.reshape(B, scale, scale, scale)
    half = scale // 2

    # 8 shifted views: weights[c] at (x - dx, y - dy, z - dz), d in {1,0}
    gp = jnp.pad(g, ((0, 0), (1, 0), (1, 0), (1, 0)))  # left-pad for -1 shifts
    views = []
    coords = []
    xs = jnp.arange(scale)
    xg, yg, zg = jnp.meshgrid(xs, xs, xs, indexing="ij")
    for dx in (1, 0):
        for dy in (1, 0):
            for dz in (1, 0):
                views.append(
                    gp[:, 1 - dx : 1 - dx + scale, 1 - dy : 1 - dy + scale, 1 - dz : 1 - dz + scale]
                )
                coords.append(
                    jnp.stack(
                        [xg - half - dx, yg - half - dy, zg - half - dz], axis=-1
                    )
                )
    w = jnp.stack(views, axis=-1)  # (B, s, s, s, 8)
    c = jnp.stack(coords, axis=-2).astype(grid.dtype)  # (s, s, s, 8, 3)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    ok = wsum[..., 0] >= EPS
    wn = w / jnp.maximum(wsum, EPS)
    pts = jnp.einsum("bxyzk,xyzkc->bxyzc", wn, c)
    boundary = (xg > 0) & (yg > 0) & (zg > 0)
    pts = jnp.where((ok & boundary)[..., None], pts, 0.0)
    return pts.reshape(B, scale**3, 3) / scale * 2.0


@functools.partial(jax.jit, static_argnums=(2,))
def cubic_feature_sampling(
    ptcloud: jax.Array, cubic_features: jax.Array, neighborhood_size: int = 1
) -> jax.Array:
    """Gather voxel-vertex features around each point.

    Args:
        ptcloud: (B, N, 3) in [-1, 1].
        cubic_features: (B, s, s, s, C) feature volume (channels-last; the
            reference is channels-first).
        neighborhood_size: vertices per axis = 2·neighborhood_size.
    Returns:
        (B, N, (2·ns)³, C) features, 0 outside the grid.
    """
    B, s = cubic_features.shape[0], cubic_features.shape[1]
    C = cubic_features.shape[-1]
    ns = neighborhood_size
    half = s / 2.0
    pts = ptcloud * half + half  # → [0, s]
    lower = jax.lax.stop_gradient(jnp.floor(pts)).astype(jnp.int32)  # (B, N, 3)

    offs = jnp.arange(1 - ns, 1 + ns)  # e.g. ns=1 → [0, 1]
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    off = jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)  # (V, 3)
    vtx = lower[:, :, None, :] + off[None, None]  # (B, N, V, 3)
    valid = jnp.all((vtx >= 0) & (vtx < s), axis=-1)
    vc = jnp.clip(vtx, 0, s - 1)
    flat = (vc[..., 0] * s + vc[..., 1]) * s + vc[..., 2]  # (B, N, V)

    feats_flat = cubic_features.reshape(B, s**3, C)
    gathered = jax.vmap(lambda f, i: f[i])(feats_flat, flat)  # (B, N, V, C)
    return jnp.where(valid[..., None], gathered, 0.0)


def gridding_distance(pred_cloud, gt_cloud, scale: int, span: float = 2.0):
    """Per-corner-slot rasterisation of both clouds on a shared dynamic grid.

    Reference extensions/gridding_loss/__init__.py:42-89 +
    gridding_distance.cu:180-207: scale the clouds by scale/2, take the joint
    bbox over BOTH clouds and the whole batch (floor(min)-1 / ceil(max)+1,
    computed BEFORE zero-row stripping, so padded zeros widen the bbox to
    include the origin), and scatter trilinear corner weights into a grid of
    (max-min+1)³ vertices × 8 corner slots anchored at the bbox minimum.

    XLA needs static shapes, so the grid lives in a fixed buffer of
    L = ceil(span·scale/2) + 3 vertices per axis (the worst case for clouds
    whose per-axis extent is ≤ ``span`` in input units — span=2 covers the
    usual [-1, 1]) with a *traced* index offset at the bbox minimum: the
    rasterisation is exact wherever the dynamic grid fits the buffer,
    regardless of where the cloud sits in space. Vertices beyond the dynamic
    bbox stay zero in BOTH grids, and the returned element count is the
    dynamic one, so the L1 *mean* matches the reference exactly.

    Returns (pred_grid, gt_grid, n_elems): grids (B, L, L, L, 8) plus the
    traced dynamic element count for the mean.
    """
    half = scale / 2.0
    p = pred_cloud * half
    g = gt_cloud * half
    L = int(-(-span * scale // 2)) + 3  # ceil(span·scale/2) + 3

    # joint dynamic bbox (reference __init__.py:56-76: over both clouds and
    # the full batch, zero-padded rows included)
    allpts = jnp.concatenate([p, g], axis=1)
    mn = jnp.floor(jnp.min(allpts, axis=(0, 1))) - 1.0  # (3,)
    mx = jnp.ceil(jnp.max(allpts, axis=(0, 1))) + 1.0
    origin = jax.lax.stop_gradient(mn).astype(jnp.int32)

    def raster(pts, raw):
        mask = _nonzero_mask(raw)
        corners, weights = _corner_data(pts)
        weights = weights * mask[..., None]
        idx = corners - origin  # anchored at the dynamic bbox minimum
        valid = jnp.all((idx >= 0) & (idx < L), axis=-1)
        flat = ((idx[..., 0] * L + idx[..., 1]) * L + idx[..., 2]) * 8 + jnp.arange(8)[
            None, None
        ]
        flat = jnp.where(valid, flat, 0)
        weights = jnp.where(valid, weights, 0.0)

        def scatter_one(f, w):
            return jnp.zeros((L * L * L * 8,), w.dtype).at[f.reshape(-1)].add(
                w.reshape(-1)
            )

        return jax.vmap(scatter_one)(flat, weights).reshape(-1, L, L, L, 8)

    pred_grid = raster(p, pred_cloud)
    gt_grid = raster(g, gt_cloud)

    # Non-silent truncation guard: if the dynamic bbox outgrows the static
    # buffer (e.g. early-training GRNet predictions escaping [-1, 1] with a
    # too-small ``span``), points beyond the buffer are dropped from both
    # grids while n_elems still counts the full dynamic bbox — flag it.
    # jax.debug.print is a host callback, which the axon TPU backend does
    # not support (UNIMPLEMENTED: host send/recv) — emit only where
    # callbacks work; on TPU the fix is the same either way: raise ``span``.
    if jax.default_backend() != "tpu":
        overflow = jnp.max(mx - mn + 1.0) > float(L)
        jax.lax.cond(
            overflow,
            lambda: jax.debug.print(
                "gridding_distance: dynamic bbox ({n} vertices/axis) exceeds "
                "the static buffer (L={l}); out-of-buffer points dropped — "
                "raise `span` to cover the cloud extent",
                n=jnp.max(mx - mn + 1.0),
                l=L,
            ),
            lambda: None,
        )

    n_elems = jnp.prod(mx - mn + 1) * 8 * pred_cloud.shape[0]
    return pred_grid, gt_grid, n_elems


def gridding_loss(pred_cloud, gt_cloud, scales, alphas, span: float = 2.0):
    """Σ_i alpha_i · L1mean(pred_grid_i, gt_grid_i)
    (reference __init__.py:92-114). ``span`` sizes the static buffer of every
    per-scale gridding_distance call (input-unit cloud extent it must cover)."""
    total = 0.0
    for s, a in zip(scales, alphas):
        pg, gg, n = gridding_distance(pred_cloud, gt_cloud, int(s), span=span)
        total = total + a * jnp.sum(jnp.abs(pg - gg)) / jnp.maximum(n, 1.0)
    return total
