"""Stochastic point-cloud sampling ops used inside model forward passes.

Functional equivalents of reference utils/misc.py helpers; all take explicit
PRNG keys (JAX-style) instead of mutating global RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pointops import index_points


def jitter_points(
    key: jax.Array, pc: jax.Array, std: float = 0.01, clip: float = 0.05
) -> jax.Array:
    """Add clipped Gaussian noise to every point.

    Reference utils/misc.py:12-19 (same noise is broadcast across the batch
    there via a per-sample loop drawing (N, 3); we draw i.i.d. per batch
    element, which is the intended behaviour).
    """
    noise = jnp.clip(
        std * jax.random.normal(key, pc.shape, dtype=pc.dtype), -clip, clip
    )
    return pc + noise


def random_sample(key: jax.Array, data: jax.Array, number: int) -> jax.Array:
    """Sample ``number`` distinct points uniformly at random.

    Reference utils/misc.py:21-30 (multinomial over uniform weights ==
    uniform sampling without replacement). Implemented as a random-key sort,
    which is O(N log N) and shape-static.
    """
    B, N, _ = data.shape
    scores = jax.random.uniform(key, (B, N))
    _, idx = jax.lax.top_k(scores, number)
    return index_points(data, idx.astype(jnp.int32))


def random_scale(
    key: jax.Array, partial: jax.Array, gt: jax.Array, scale_range=(0.8, 1.2)
) -> tuple[jax.Array, jax.Array]:
    """Shared random uniform scale for (partial, gt) (reference utils/misc.py:278-280)."""
    scale = jax.random.uniform(
        key, (), minval=scale_range[0], maxval=scale_range[1], dtype=partial.dtype
    )
    return partial * scale, gt * scale


def separate_point_cloud(
    xyz: jax.Array,
    num_crop: int,
    fixed_point: jax.Array | None = None,
    key: jax.Array | None = None,
    padding_zeros: bool = False,
):
    """ShapeNet-55 crop protocol: split each cloud into (input, crop) by
    distance to a view direction.

    Reference utils/misc.py:153-213 (``seprate_point_cloud``): the
    ``num_crop`` points closest to a unit direction (random, or one of the
    8 fixed corner viewpoints at test time, tools/runner.py:627-653) become
    the crop; the rest (or a zero-masked copy with ``padding_zeros``) is the
    partial input. Fixed-shape: ``num_crop`` is static.

    Returns (input_data, crop_data): (B, N-num_crop, 3)/(B, num_crop, 3), or
    (B, N, 3) zero-masked input when ``padding_zeros``.
    """
    B, N, _ = xyz.shape
    if fixed_point is None:
        assert key is not None
        center = jax.random.normal(key, (B, 1, 3))
    else:
        center = jnp.broadcast_to(jnp.asarray(fixed_point).reshape(1, 1, 3), (B, 1, 3))
    center = center / jnp.linalg.norm(center, axis=-1, keepdims=True)
    dist = jnp.linalg.norm(center - xyz, axis=-1)  # (B, N)
    order = jnp.argsort(dist, axis=-1)  # ascending: nearest to view first
    sorted_pts = index_points(xyz, order.astype(jnp.int32))
    crop_data = sorted_pts[:, :num_crop]
    if padding_zeros:
        mask = (jnp.arange(N) >= num_crop)[None, :, None]
        input_data = sorted_pts * mask
    else:
        input_data = sorted_pts[:, num_crop:]
    return input_data, crop_data


def random_dropping(key: jax.Array, pc: jax.Array, e: int) -> jax.Array:
    """KITTI-style random point dropping with zero-pad back to fixed shape.

    Reference utils/misc.py:268-275 picks ``up_num = max(64, 768//(e//50+1))``
    points and zero-pads to 2048. Fixed-shape version: keep a random subset of
    that size, zero the rest.
    """
    up_num = max(64, 768 // (e // 50 + 1))
    B, N, _ = pc.shape
    scores = jax.random.uniform(key, (B, N))
    _, keep = jax.lax.top_k(scores, min(up_num, N))
    kept = index_points(pc, keep.astype(jnp.int32))
    out = jnp.zeros_like(pc)
    return jax.lax.dynamic_update_slice(out, kept, (0, 0, 0))
