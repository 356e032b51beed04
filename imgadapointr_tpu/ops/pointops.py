"""Core point-cloud geometry ops (pure XLA, shape-static, batched).

Functional equivalents of the reference's dense geometry helpers
(reference: models/Transformer_utils.py:19-69) and of the pointnet2_ops CUDA
kernels ``three_nn``/``three_interpolate``/``gather_operation``
(reference: models/Transformer_utils.py:228-232, models/base_blocks.py:548-563).

All functions are jit-safe (static shapes, no Python control flow on traced
values) and differentiable where the reference op is differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.envflags import env_flag


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distance.

    Args:
        src: (..., N, C) source points.
        dst: (..., M, C) target points.
    Returns:
        (..., N, M) squared distances.

    Matches reference models/Transformer_utils.py:32-51:
    ``-2 src·dstᵀ + |src|² + |dst|²``.
    """
    # Precision.HIGHEST: on TPU the default bf16 matmul loses ~5e-3 absolute
    # on the -2x·y term, which breaks the |x-y|^2 cancellation. K=3 makes this
    # matmul bandwidth-bound, so full-precision costs nothing.
    # Accumulate in promote(input, f32): f32 in production, f64 under the
    # x64 gradient-parity harness — a hard f32 cast here flipped near-tie
    # kNN selections (denoise targets on exact-duplicate points) vs the
    # fp64 torch reference.
    acc_t = jnp.promote_types(src.dtype, jnp.float32)
    d = -2.0 * jnp.einsum(
        "...nc,...mc->...nm",
        src,
        dst,
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = d + jnp.sum(src.astype(acc_t) ** 2, axis=-1, keepdims=True)
    d = d + jnp.sum(dst.astype(acc_t) ** 2, axis=-1)[..., None, :]
    return d


def knn_point(nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """Indices of the ``nsample`` nearest neighbours in ``xyz`` for each query.

    Args:
        nsample: number of neighbours (static).
        xyz: (B, N, C) reference points.
        new_xyz: (B, S, C) query points.
    Returns:
        (B, S, nsample) int32 indices into ``xyz``.

    Matches reference models/Transformer_utils.py:19-30
    (``topk(largest=False)`` over the dense distance matrix). Ascending
    distance order (the reference uses ``sorted=False``; downstream consumers
    are order-invariant gathers/maxpools).

    On TPU dispatches to the Pallas kernel (VMEM-resident distance tiles,
    ~3× faster than materialising (B, S, N) + sort-based top_k).
    """
    return knn_with_distance(nsample, xyz, new_xyz)[1]


def knn_with_distance(
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    diff_form: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`knn_point` but also returns the squared distances.

    Non-differentiable, matching pointnet2: the reference's kNN/three_nn CUDA
    Functions return no input gradients (three_nn backward is undefined;
    interpolation weights are constants to autograd), so neither path here
    propagates tangents. This also lets the Pallas kernel (no JVP rule) sit
    inside differentiated graphs.

    ``diff_form=True`` makes the XLA fallback rank by elementwise ``Σ(q−x)²``
    distances (the Pallas peeling kernel's form — no matmul cancellation
    floor) instead of :func:`square_distance`'s matmul form; used by
    ``ops/sharded.py`` so per-block selection is consistent at every block
    size regardless of the Pallas dispatch gate.
    """
    import os

    xyz = jax.lax.stop_gradient(xyz)
    new_xyz = jax.lax.stop_gradient(new_xyz)
    # Pallas only where it beats XLA AND the Mosaic compile is worth it:
    # each distinct-shape pallas_call costs a separate (slow) remote kernel
    # compile, so small problems stay on the XLA path. Gate ≥ 2^16 pairs
    # (round 3): the XLA fallback's sort-based top_k costs 1.44 ms per
    # (32, 512, 512) kNN in the flagship eval trace vs ~0.3 ms for the
    # peeling kernel; 2^16 also puts the mid-config A/B shapes (256×256)
    # on the kernel so the convergence gate exercises this dispatch.
    if (
        jax.default_backend() == "tpu"
        and nsample <= 64
        and xyz.shape[1] * new_xyz.shape[1] >= 1 << 16
        and not env_flag("IMGADAPOINTR_DISABLE_PALLAS_KNN")
    ):
        from .pallas.nn_distance import knn_pallas

        # exact peeling kernel — a packed-index variant (near-tie rank
        # swaps) measured ~0.5 CD-L1 worse at epoch 20 on the synthetic
        # convergence A/B (benchmarks/RESULTS.md "Negative results")
        return knn_pallas(nsample, xyz, new_xyz)
    if diff_form:
        # cancellation-free elementwise distances — same form as the Pallas
        # peeling kernel, so selection is identical on either side of the
        # dispatch gate (ops/sharded.py relies on this at every block size)
        diff = new_xyz[:, :, None, :] - xyz[:, None, :, :]
        sqrdists = jnp.sum(diff * diff, axis=-1)
    else:
        sqrdists = square_distance(new_xyz, xyz)
    neg, idx = jax.lax.top_k(-sqrdists, nsample)
    return -neg, idx.astype(jnp.int32)


def _use_pallas_gather(points: jax.Array, idx: jax.Array) -> bool:
    """Dispatch narrow large gathers to the Pallas row-gather kernel.

    XLA's TPU gather is row-rate bound (~170M rows/s); the VMEM lane-gather
    kernel is ~3-4× faster for narrow rows (see ops/pallas/gather_rows.py).
    Gates: table resident in VMEM, narrow rows (wide gathers are
    bandwidth-bound and XLA already handles them well), and enough total
    rows to be worth one remote Mosaic compile per distinct shape. Two
    kernel regimes (ops/pallas/gather_rows.py):

    - M ≤ 4096, C ≤ 128: chunk-probe kernel (unrolled O(M/128) probes).
    - 4096 < M ≤ 16384, C ≤ 8: two-level hi/lo kernel (the chamfer
      residual gathers at the paper recipe: 16384-row tables, C=3 —
      measured 1.14 vs 3.46 ms XLA at 16×16384 rows, bit-exact).
    """
    import os
    import numpy as np

    if points.ndim != 3 or points.dtype != jnp.float32:
        return False
    if jax.default_backend() != "tpu" or os.environ.get(
        "IMGADAPOINTR_DISABLE_PALLAS_GATHER"
    ):
        return False
    # regime thresholds live with the kernel (gather_rows.py) so this gate
    # and the kernel's internal probe/hi-lo switch can never drift apart
    from .pallas.gather_rows import MAX_C, MAX_C_HILO, MAX_M, MAX_M_HILO

    total_rows = points.shape[0] * int(np.prod(idx.shape[1:]))
    M, C = points.shape[1], points.shape[2]
    fits = (M <= MAX_M and C <= MAX_C) or (
        M <= MAX_M_HILO and C <= MAX_C_HILO
    )
    return fits and total_rows >= 1 << 15


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: ``out[b, ..., :] = points[b, idx[b, ...], :]``.

    Args:
        points: (B, N, C).
        idx: (B, S) or (B, S, K) int indices.
    Returns:
        (B, S, C) or (B, S, K, C).

    Matches reference models/Transformer_utils.py:53-69. Large narrow
    gathers dispatch to the Pallas lane-gather kernel (bit-identical
    values AND gradients; opt-out IMGADAPOINTR_DISABLE_PALLAS_GATHER).
    """
    if _use_pallas_gather(points, idx):
        from .pallas.gather_rows import gather_rows_pallas

        B = idx.shape[0]
        flat = idx.reshape(B, -1)
        out = gather_rows_pallas(points, flat)
        return out.reshape(*idx.shape, points.shape[2])
    return jax.vmap(lambda p, i: p[i])(points, idx)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Alias of :func:`index_points` (pointnet2 ``gather_operation`` in B-N-C layout)."""
    return index_points(points, idx)


def three_nn(unknown: jax.Array, known: jax.Array) -> tuple[jax.Array, jax.Array]:
    """For each query point, the 3 nearest reference points.

    Args:
        unknown: (B, N, 3) query positions.
        known: (B, M, 3) reference positions.
    Returns:
        ``(dist, idx)``: (B, N, 3) *euclidean* (not squared) distances and
        (B, N, 3) int32 indices — pointnet2 ``three_nn`` semantics
        (reference usage: models/Transformer_utils.py:228, :353, :584).
    """
    sqdist, idx = knn_with_distance(3, known, unknown)
    dist = jnp.sqrt(jnp.maximum(sqdist, 0.0))
    return dist, idx


def three_interpolate(feats: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted interpolation of features at 3 neighbour indices.

    Args:
        feats: (B, M, C) features at the reference points (B-N-C layout; the
            reference CUDA op uses channels-first, callers here stay B-N-C).
        idx: (B, N, 3) neighbour indices.
        weight: (B, N, 3) interpolation weights.
    Returns:
        (B, N, C) interpolated features.
    """
    nbr = index_points(feats, idx)  # B N 3 C
    return jnp.einsum("bnkc,bnk->bnc", nbr, weight)


def three_nn_interpolate(
    unknown: jax.Array, known: jax.Array, feats: jax.Array, eps: float = 1e-8
) -> jax.Array:
    """Fused inverse-distance 3-NN interpolation.

    Combines the reference's ``three_nn`` + reciprocal-distance weighting +
    ``three_interpolate`` chain (models/Transformer_utils.py:228-232):
    ``w_i = (1/(d_i+eps)) / Σ_j 1/(d_j+eps)``.

    On TPU, large problems dispatch to ONE Pallas kernel that computes the
    3-NN in VMEM and emits the interpolation as a sparse-weight-row MXU
    matmul — the (B, S, 3, C) neighbour-gather never materialises (the
    deformable-attention and SnowFlakeNet hot path). Differentiable w.r.t.
    ``feats`` only (positions are stop-gradient, pointnet2 parity).
    """
    import os

    # Default ON (opt-out: IMGADAPOINTR_DISABLE_PALLAS_INTERP=1). Measured
    # 4.7 ms vs 10.8 ms XLA chain (2.3×) at the deformable-attention shape
    # 32×4608×576×192 on v5e; SAFE by the selection-exactness criterion
    # (benchmarks/RESULTS.md): neighbour indices bit-match the XLA chain
    # (diff-form distances, first-index ties — idx match 1.0000 at the
    # benchmarks/kernels.py gate shapes), weights use the identical
    # 1/(√d+eps) formula, and only the final weighted-sum contraction order
    # differs (HIGHEST-precision matmul vs gather+einsum, out-rel ≤ 2e-7).
    # VMEM feasibility: the kernel's FIXED blocks — the (Mp, Cp) feats table
    # and (8, Mp) coords — must leave room for the TS-scaled row budget
    # inside Mosaic's 16 MB scoped limit; M=4096 with C≥900 would otherwise
    # pass an independent M/C gate yet OOM at compile.
    Mp = known.shape[1] + (-known.shape[1]) % 128
    Cp = feats.shape[-1] + (-feats.shape[-1]) % 128
    if (
        jax.default_backend() == "tpu"
        and unknown.shape[1] * known.shape[1] >= 1 << 20
        and known.shape[1] <= 4096
        and feats.shape[-1] <= 1024
        and 4 * Mp * (Cp + 8) <= 10 * 1024 * 1024
        and not env_flag("IMGADAPOINTR_DISABLE_PALLAS_INTERP")
    ):
        return _three_nn_interpolate_fused(unknown, known, feats, eps)
    dist, idx = three_nn(unknown, known)
    recip = 1.0 / (dist + eps)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return three_interpolate(feats, idx, weight)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _three_nn_interpolate_fused(unknown, known, feats, eps):
    out, _, _ = _fused_interp_impl(unknown, known, feats, eps)
    return out


def _fused_interp_impl(unknown, known, feats, eps):
    from .pallas.nn_distance import three_nn_interpolate_pallas

    unknown = jax.lax.stop_gradient(unknown)
    known = jax.lax.stop_gradient(known)
    return three_nn_interpolate_pallas(unknown, known, feats, eps)


def _fused_interp_fwd(unknown, known, feats, eps):
    out, idx, w = _fused_interp_impl(unknown, known, feats, eps)
    return out, (idx, w, unknown.shape, known.shape, feats.shape[1])


def _fused_interp_bwd(eps, res, g):
    idx, w, u_shape, k_shape, m_rows = res
    # dfeats[b, idx[b,s,k], :] += w[b,s,k] * g[b,s,:] — same scatter the
    # XLA chain's autodiff emits; positions get ZERO gradient (pointnet2
    # parity: three_nn has no backward; both are stop-gradient upstream)
    contrib = w[..., None] * g[:, :, None, :]  # (B, S, 3, C)

    def one(i, v):
        return jnp.zeros((m_rows, v.shape[-1]), v.dtype).at[i.reshape(-1)].add(
            v.reshape(-1, v.shape[-1])
        )

    dfeats = jax.vmap(one)(idx, contrib).astype(g.dtype)
    return jnp.zeros(u_shape, g.dtype), jnp.zeros(k_shape, g.dtype), dfeats


_three_nn_interpolate_fused.defvjp(_fused_interp_fwd, _fused_interp_bwd)


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample(
    xyz: jax.Array, npoint: int, diff_form: bool = False
) -> jax.Array:
    """Farthest point sampling — indices of ``npoint`` spread-out points.

    Iterative argmax over a running min-distance cache, seeded at index 0,
    matching the pointnet2 CUDA kernel semantics used by the reference
    (utils/misc.py:32-40, models/base_blocks.py:547-563).

    On TPU dispatches to the Pallas kernel (VMEM-resident cache, ~3× faster);
    the XLA fori_loop below is the reference implementation and the
    CPU/interpret path.

    ``diff_form=True`` makes the XLA fallback compute cancellation-free
    elementwise ``Σ(x−p)²`` distances (the Pallas FPS kernel's arithmetic)
    instead of the matmul form — the block-size-independent reference that
    ``ops/sharded.py``'s sharded FPS is equality-tested against.

    Args:
        xyz: (B, N, 3).
        npoint: static number of samples.
    Returns:
        (B, npoint) int32 indices.
    """
    xyz = jax.lax.stop_gradient(xyz)  # FPS indices are discrete (pointnet2)
    # size-gated like knn: small FPS calls compile+run fine on XLA. Gate
    # ≥ 2^15 (round 3): the grouper's second downsample (512→256) ran the
    # sequential XLA while-loop at 1.5 ms in the flagship eval trace; the
    # VMEM-cache kernel does it in ~0.3 ms. 2^15 keeps the mid-config A/B
    # shapes (256→128) on the kernel so the convergence gate covers it.
    if jax.default_backend() == "tpu" and xyz.shape[1] * npoint >= 1 << 15:
        from .pallas.fps import furthest_point_sample_pallas

        return furthest_point_sample_pallas(xyz, npoint)
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    xsq = jnp.sum(xyz * xyz, axis=-1)  # (B, N), reused every iteration

    def body(i, state):
        mindist, idxs, last = state
        lastp = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # B 1 3
        if diff_form:
            d = jnp.sum((xyz - lastp) ** 2, axis=-1)
        else:
            last_sq = jnp.take_along_axis(xsq, last[:, None], axis=1)  # B 1
            # |x - p|^2 = |x|^2 - 2 x·p + |p|^2 (one small matvec, VPU-friendly)
            d = (
                xsq
                - 2.0
                * jnp.einsum(
                    "bnc,bmc->bn", xyz, lastp,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + last_sq
            )
        mindist = jnp.minimum(mindist, d)
        nxt = jnp.argmax(mindist, axis=-1).astype(jnp.int32)
        idxs = jax.lax.dynamic_update_index_in_dim(idxs, nxt, i, axis=1)
        return mindist, idxs, nxt

    init_idx = jnp.zeros((B,), jnp.int32)
    idxs = jnp.zeros((B, npoint), jnp.int32)
    mindist = jnp.full((B, N), 1e10, jnp.float32)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (mindist, idxs, init_idx))
    return idxs


def ball_query(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """Indices of up to ``nsample`` points within ``radius`` of each query.

    Exact pointnet2 ``ball_query`` semantics: slots are filled with the first
    ``nsample`` in-radius points in INDEX order (not distance order); short
    neighbourhoods repeat the first in-radius point; queries with no in-radius
    point keep index 0 (the CUDA kernel leaves its zero-init). Returns
    (B, S, nsample) int32.
    """
    N = xyz.shape[1]
    sqd = square_distance(new_xyz, xyz)
    in_ball = sqd <= radius * radius
    # first nsample in-radius indices in index order: sort key = index when
    # in-ball else N (pushed past every real index)
    key = jnp.where(in_ball, jnp.arange(N)[None, None, :], N)
    neg, _ = jax.lax.top_k(-key, min(nsample, N))
    idx = -neg  # ascending index order, invalid slots = N
    if nsample > N:  # more slots than points: extra slots repeat the filler
        idx = jnp.concatenate(
            [idx, jnp.full((*idx.shape[:-1], nsample - N), N, idx.dtype)], axis=-1
        )
    valid = idx < N
    first = jnp.where(valid[..., :1], idx[..., :1], 0)
    return jnp.where(valid, idx, first).astype(jnp.int32)


def fps(data: jax.Array, number: int) -> jax.Array:
    """FPS returning the sampled coordinates (reference utils/misc.py:32-40)."""
    idx = furthest_point_sample(jax.lax.stop_gradient(data), number)
    return index_points(data, idx)
