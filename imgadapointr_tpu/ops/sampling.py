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
        # only the RANDOM center is unit-normalised (F.normalize in the
        # reference); fixed corner viewpoints like (1,1,1) are used raw —
        # scaling them would change the distance ordering and the crop.
        center = center / jnp.linalg.norm(center, axis=-1, keepdims=True)
    else:
        center = jnp.broadcast_to(jnp.asarray(fixed_point).reshape(1, 1, 3), (B, 1, 3))
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


def random_dropping(key: jax.Array, pc: jax.Array, epoch) -> jax.Array:
    """KITTI-finetune random point dropping with zero-pad back to fixed shape.

    Reference utils/misc.py:268-275: ``up_num = max(64, 768//(e//50+1))``,
    keep ``randint(1, up_num)`` points chosen by FPS (spatially spread), then
    zero-pad to the original size. Fixed-shape version: compute the full FPS
    ordering once (the first k of an FPS ordering == fps(pc, k)) and mask all
    slots beyond the random keep-count. ``epoch`` may be traced.
    """
    from .pointops import furthest_point_sample

    B, N, _ = pc.shape
    e = jnp.asarray(epoch, jnp.int32)
    up_num = jnp.maximum(64, 768 // (e // 50 + 1))
    keep_n = jax.random.randint(key, (), 1, jnp.maximum(up_num, 2))
    # keep_n < up_num <= 768 always, so only the first min(N, 768) slots of
    # the farthest-first ordering can survive the mask — FPS that prefix
    # instead of the full N-iteration ordering (2.7x fewer sequential
    # argmax steps at the KITTI N=2048).
    S = min(N, 768)
    order = furthest_point_sample(pc, S)  # farthest-first prefix
    spread = index_points(pc, order)
    mask = (jnp.arange(S) < keep_n)[None, :, None]
    spread = spread * mask.astype(pc.dtype)
    if S < N:
        spread = jnp.concatenate(
            [spread, jnp.zeros((B, N - S, 3), pc.dtype)], axis=1
        )
    return spread


def train_random_crop(
    key: jax.Array, gt: jax.Array, npoints: int, out_points: int = 2048
) -> jax.Array:
    """ShapeNet-55/34 train-time augmentation: crop a random-size chunk
    toward a random view direction, FPS the remainder to ``out_points``.

    Reference tools/runner.py:177-181 + utils/misc.py:153-213: per-sample
    ``num_crop ~ U[N/4, 3N/4]``, the ``num_crop`` points nearest a random
    unit direction are dropped, the rest FPS'd to 2048. Fixed-shape version:
    sort by distance to the view, replace the cropped (nearest) prefix with
    duplicates of the farthest kept point — FPS never picks a duplicate
    (min-distance 0) before a distinct point, and the kept count
    (>= N/4 >= out_points) always exceeds ``out_points``.
    """
    from .pointops import fps

    B, N, _ = gt.shape
    assert N == npoints
    lo, hi = npoints // 4, (npoints * 3) // 4
    k_center, k_crop = jax.random.split(key)
    center = jax.random.normal(k_center, (B, 1, 3))
    center = center / jnp.linalg.norm(center, axis=-1, keepdims=True)
    num_crop = jax.random.randint(k_crop, (B, 1), lo, hi + 1)
    dist = jnp.linalg.norm(center - gt, axis=-1)  # (B, N)
    order = jnp.argsort(dist, axis=-1)  # nearest to view first = cropped
    sorted_pts = index_points(gt, order.astype(jnp.int32))
    keep = jnp.arange(N)[None, :] >= num_crop  # (B, N)
    filler = sorted_pts[:, -1:, :]  # farthest point, always kept
    kept_pts = jnp.where(keep[..., None], sorted_pts, filler)
    return fps(kept_pts, out_points)
