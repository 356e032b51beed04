"""Point-axis sharded geometry ops — big-N scaling over the device mesh.

The reference has no analog: its scale story stops at DDP over batches
(SURVEY.md §2.7) and its CUDA kernels assume one cloud fits one GPU. In
this domain "long context" means *more points per cloud* (SURVEY.md §5),
so the TPU-native scaling axis is the POINT dimension: shard the N points
of a cloud across devices with ``shard_map`` and let the nearest-neighbour
ops ride ICI with ``ppermute`` rings — the same systolic pattern as ring
attention, applied to O(N·M) distance fields.

Design (per op, all exact — no approximation):

- ``sharded_nn_distance``: each device holds an N/p slice of ``x`` and an
  M/p block of ``y``. A p-step ``ppermute`` ring circulates the y-blocks;
  each step updates a running (min, argmin) for the local x rows using the
  unsharded op's tiled scan in DIFF-FORM (``diff_form=True``): selection
  arithmetic is the cancellation-free ``Σ(x−y)²`` of the Pallas kernels at
  EVERY per-block size, never the matmul form whose f32 floor flips
  near-tie picks (the convergence hazard in benchmarks/RESULTS.md) — the
  inner Pallas gate keys on local pair count, so block form must not
  depend on it. Ties break by LOWEST GLOBAL INDEX (enforced explicitly, so
  the result is invariant to ring order; equal to the unsharded op except
  near-tie picks in its matmul-form XLA-scan regime). Peak per-device
  memory is O(B·(N + M)/p) — the (N, M) distance field is never
  materialised globally *or* locally.
- Gradients: a second (differentiable) ring re-gathers the winning
  neighbour coordinates block-by-block; d = |x − y[i]|² is recomputed from
  them, so ``jax.grad`` of the sharded chamfer losses flows to both clouds
  through ``ppermute`` transposes (XLA inserts the reverse ring) —
  matching the unsharded custom VJP exactly.
- ``sharded_knn``: same ring, carrying a running top-k per query row,
  merged each step by a lexicographic (distance, global-index) sort —
  order-invariant and equal to the unsharded ``knn_point``.
- ``sharded_fps``: farthest-point sampling with the distance cache sharded
  over points; each iteration does a local argmax then three tiny
  psum-family reductions (pmax/pmin/psum) to pick the global winner with
  the unsharded op's lowest-index tie-break.

All functions take a ``Mesh`` and the name of the mesh axis to shard the
point dimension over; inputs are plain (replicated or host) arrays and the
shard_map in_specs do the slicing. Validity masks are not supported here
(the big-N use case is raw scans, not zero-padded batches) — use the
unsharded ops for masked clouds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .chamfer import _nn_one_direction

POINTS_AXIS = "points"

_INT_MAX = jnp.iinfo(jnp.int32).max


def make_points_mesh(devices=None) -> Mesh:
    """1-D mesh with a single 'points' axis over all (given) devices."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def _ring_perm(p: int):
    return [(j, (j + 1) % p) for j in range(p)]


def _ring_argmin(x_loc, y_blk, axis: str, p: int, mloc: int, tile: int):
    """(min sqdist, global argmin) of each local x row vs the FULL ring of y.

    Selection only — wrapped in stop_gradient by callers; values are
    recomputed differentiably from the winners (`_ring_gather`).
    """
    me = lax.axis_index(axis)
    B, nloc, _ = x_loc.shape

    def step(carry, s):
        best_d, best_i, blk = carry
        # diff_form: per-block selection must stay in the cancellation-free
        # elementwise form at EVERY block size — the inner op's Pallas gate
        # keys on LOCAL pair count, so without this a big-N sharded chamfer
        # whose blocks fall under the gate would silently select via
        # matmul-form distances (the measured training-convergence hazard,
        # benchmarks/RESULTS.md "selection precision is gradient quality").
        d, i = _nn_one_direction(x_loc, blk, None, tile, diff_form=True)
        base = ((me - s) % p) * mloc  # origin shard of the block at step s
        gi = i + base
        # lowest-global-index tie-break: ring-order invariant, and equal to
        # the unsharded scan path's first-tile-wins behaviour.
        upd = (d < best_d) | ((d == best_d) & (gi < best_i))
        best_d = jnp.where(upd, d, best_d)
        best_i = jnp.where(upd, gi, best_i)
        blk = lax.ppermute(blk, axis, _ring_perm(p))
        return (best_d, best_i, blk), None

    init = (
        jnp.full((B, nloc), jnp.inf, jnp.float32),
        jnp.full((B, nloc), _INT_MAX, jnp.int32),
        y_blk,
    )
    (best_d, best_i, _), _ = lax.scan(step, init, jnp.arange(p))
    return best_d, best_i


def _ring_gather(y_blk, best_i, axis: str, p: int, mloc: int):
    """Differentiable gather of y[best_i] when y lives in ring blocks.

    Each step selects the rows whose winner falls in the current block's
    global range; the transpose (a masked scatter + reverse ppermute ring)
    is derived by autodiff, giving the y-side chamfer gradient.
    """
    me = lax.axis_index(axis)
    best_i = lax.stop_gradient(best_i)
    B, nloc = best_i.shape

    def step(carry, s):
        blk, acc = carry
        base = ((me - s) % p) * mloc
        loc = jnp.clip(best_i - base, 0, mloc - 1)
        g = jnp.take_along_axis(blk, loc[..., None], axis=1)
        hit = (best_i >= base) & (best_i < base + mloc)
        acc = acc + jnp.where(hit[..., None], g, 0.0)
        blk = lax.ppermute(blk, axis, _ring_perm(p))
        return (blk, acc), None

    init = (
        y_blk,
        jnp.zeros((B, nloc, y_blk.shape[-1]), y_blk.dtype),
    )
    (_, out), _ = lax.scan(step, init, jnp.arange(p))
    return out


def _nn_both_directions(x_loc, y_loc, axis: str, p: int, tile: int):
    """Shared shard_map body: (d1, d2, i1, i2) + gathered winners."""
    # Barrier (same reason as chamfer._nn_distance_impl): without it XLA
    # tries to fuse whatever produced x/y into the ring-scan body and its
    # fusion search explodes (observed 60-500 s compiles). Differentiable
    # big-N training losses feed model outputs straight in here.
    x_loc, y_loc = jax.lax.optimization_barrier((x_loc, y_loc))
    nloc, mloc = x_loc.shape[1], y_loc.shape[1]
    xs = lax.stop_gradient(x_loc)
    ys = lax.stop_gradient(y_loc)
    _, i1 = _ring_argmin(xs, ys, axis, p, mloc, tile)
    _, i2 = _ring_argmin(ys, xs, axis, p, nloc, tile)
    y_at_i1 = _ring_gather(y_loc, i1, axis, p, mloc)
    x_at_i2 = _ring_gather(x_loc, i2, axis, p, nloc)
    d1 = jnp.maximum(jnp.sum((x_loc - y_at_i1) ** 2, axis=-1), 0.0)
    d2 = jnp.maximum(jnp.sum((y_loc - x_at_i2) ** 2, axis=-1), 0.0)
    return d1, d2, i1, i2


def sharded_nn_distance(
    x: jax.Array,
    y: jax.Array,
    mesh: Mesh,
    axis: str = POINTS_AXIS,
    tile: int = 1024,
):
    """Bidirectional squared NN distance with the point dims sharded.

    Same contract as :func:`ops.chamfer.nn_distance` (d1, d2, i1, i2 with
    global indices); x:(B,N,3), y:(B,M,3), N and M divisible by the axis
    size. Outputs stay sharded on the point dim. Exact: selection is
    diff-form at every block size (see module docstring); distances are
    recomputed from the gathered winners exactly as the unsharded op does,
    so values and gradients are bit-identical to the unsharded op whenever
    the argmin picks agree — always, except near-ties against the
    unsharded op's matmul-form XLA-scan regime (small global N·M), where
    the sharded pick is the better-conditioned one.
    """
    p = mesh.shape[axis]
    _check_div(x, y, p, axis)
    spec = P(None, axis, None)
    row = P(None, axis)
    f = jax.shard_map(
        functools.partial(_nn_both_directions, axis=axis, p=p, tile=tile),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(row, row, row, row),
        check_vma=False,  # pallas_call out_shapes carry no vma; rings checked by tests
    )
    return f(x, y)


def sharded_chamfer_l1(
    x: jax.Array,
    y: jax.Array,
    mesh: Mesh,
    axis: str = POINTS_AXIS,
    batch_axis: str | None = None,
) -> jax.Array:
    """CD-L1 ``(mean(sqrt d1) + mean(sqrt d2)) / 2`` over sharded clouds.

    Differentiable w.r.t. both clouds (gradients ride the reverse ring).
    ``batch_axis`` additionally shards the batch dim over that mesh axis
    (dp × sp composition inside the runner's train step, ``--sp``): the
    result is then the GLOBAL batch mean, psum'd over both axes, so the
    scalar is identical on every device — matching the unsharded loss under
    GSPMD data parallelism.
    """
    p = mesh.shape[axis]
    _check_div(x, y, p, axis)
    spec = P(batch_axis, axis, None)
    axes = (axis,) if batch_axis is None else (batch_axis, axis)
    bmul = 1 if batch_axis is None else mesh.shape[batch_axis]

    def body(x_loc, y_loc):
        d1, d2, _, _ = _nn_both_directions(x_loc, y_loc, axis, p, 1024)
        s1 = jnp.sqrt(jnp.maximum(d1, 1e-24))
        s2 = jnp.sqrt(jnp.maximum(d2, 1e-24))
        m1 = lax.psum(jnp.sum(s1), axes) / (s1.shape[0] * bmul * s1.shape[1] * p)
        m2 = lax.psum(jnp.sum(s2), axes) / (s2.shape[0] * bmul * s2.shape[1] * p)
        return (m1 + m2) / 2.0

    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=P(), check_vma=False
    )(x, y)


def sharded_chamfer_l2(
    x: jax.Array,
    y: jax.Array,
    mesh: Mesh,
    axis: str = POINTS_AXIS,
    batch_axis: str | None = None,
) -> jax.Array:
    """CD-L2 ``mean(d1) + mean(d2)`` over sharded clouds (``batch_axis``:
    see :func:`sharded_chamfer_l1`)."""
    p = mesh.shape[axis]
    _check_div(x, y, p, axis)
    spec = P(batch_axis, axis, None)
    axes = (axis,) if batch_axis is None else (batch_axis, axis)
    bmul = 1 if batch_axis is None else mesh.shape[batch_axis]

    def body(x_loc, y_loc):
        d1, d2, _, _ = _nn_both_directions(x_loc, y_loc, axis, p, 1024)
        m1 = lax.psum(jnp.sum(d1), axes) / (d1.shape[0] * bmul * d1.shape[1] * p)
        m2 = lax.psum(jnp.sum(d2), axes) / (d2.shape[0] * bmul * d2.shape[1] * p)
        return m1 + m2

    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=P(), check_vma=False
    )(x, y)


def sharded_knn(
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    mesh: Mesh,
    axis: str = POINTS_AXIS,
):
    """kNN indices into ``xyz`` for each query, both point dims sharded.

    Matches :func:`ops.pointops.knn_point` (ascending distance, ties by
    lowest global index): queries (B,S,3) sharded on S, reference points
    (B,N,3) circulated block-by-block; a running top-k per query row is
    merged each ring step via a two-key (distance, index) sort. Per-block
    ranking uses diff-form distances (the Pallas peeling kernel's
    arithmetic) at every block size — near-tie ranks can differ from the
    unsharded op only in its matmul-form XLA-top_k regime. Requires
    ``nsample <= N / axis_size`` (each block must fill a candidate set).
    Returns (B, S, nsample) int32, sharded on S. Non-differentiable
    (pointnet2 parity, like the unsharded op).
    """
    p = mesh.shape[axis]
    _check_div(xyz, new_xyz, p, axis)
    mloc = xyz.shape[1] // p
    assert nsample <= mloc, (
        f"nsample={nsample} exceeds the per-device block {mloc}; "
        f"use fewer devices or the unsharded knn_point"
    )
    from .pointops import knn_with_distance

    def body(xyz_loc, q_loc):
        xyz_loc, q_loc = lax.optimization_barrier((xyz_loc, q_loc))
        me = lax.axis_index(axis)
        B, sloc, _ = q_loc.shape

        def step(carry, s):
            best_d, best_i, blk = carry
            # diff_form: block-size-independent selection (see _ring_argmin)
            d, i = knn_with_distance(
                nsample, blk, q_loc, diff_form=True
            )  # (B, sloc, k)
            gi = i + ((me - s) % p) * mloc
            dcat = jnp.concatenate([best_d, d.astype(jnp.float32)], axis=-1)
            icat = jnp.concatenate([best_i, gi], axis=-1)
            # two-key sort (distance, then global index): ring-order
            # invariant, equal to the unsharded top_k's positional ties
            dsrt, isrt = lax.sort((dcat, icat), dimension=2, num_keys=2)
            return (dsrt[..., :nsample], isrt[..., :nsample], lax.ppermute(
                blk, axis, _ring_perm(p)
            )), None

        init = (
            jnp.full((B, sloc, nsample), jnp.inf, jnp.float32),
            jnp.full((B, sloc, nsample), _INT_MAX, jnp.int32),
            xyz_loc,
        )
        (_, best_i, _), _ = lax.scan(step, init, jnp.arange(p))
        return best_i

    spec = P(None, axis, None)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=P(None, axis, None),
        check_vma=False,
    )(lax.stop_gradient(xyz), lax.stop_gradient(new_xyz))


def sharded_fps(
    xyz: jax.Array, npoint: int, mesh: Mesh, axis: str = POINTS_AXIS
) -> jax.Array:
    """Farthest-point sampling with the running min-distance cache sharded.

    Matches :func:`ops.pointops.furthest_point_sample` (seed = global index
    0, argmax ties by lowest index): each iteration takes a local argmax of
    the sharded cache, then pmax/pmin/psum reductions over the axis pick
    the global winner. Distances are diff-form ``Σ(x−last)²`` (the Pallas
    FPS kernel's arithmetic, cancellation-free at every block size); the
    unsharded op's matmul-form XLA regime can disagree only on near-tie
    argmax winners. Returns (B, npoint) int32 global indices, replicated.
    """
    p = mesh.shape[axis]
    _check_div(xyz, xyz, p, axis)
    nloc = xyz.shape[1] // p

    def body(x_loc):
        (x_loc,) = lax.optimization_barrier((x_loc,))
        me = lax.axis_index(axis)
        x_loc = x_loc.astype(jnp.float32)
        B = x_loc.shape[0]

        # seed: global index 0 lives at local row 0 of shard 0
        seed = jnp.where(me == 0, x_loc[:, 0, :], 0.0)
        last = lax.psum(seed, axis)  # (B, 3) coords of the seed, replicated

        def body_it(it, state):
            mindist, idxs, last = state
            # diff-form |x − last|²: cancellation-free, block-size
            # independent (the matmul form's f32 floor could flip the
            # argmax winner vs the Pallas FPS kernel's selection)
            d = jnp.sum((x_loc - last[:, None, :]) ** 2, axis=-1)
            mindist = jnp.minimum(mindist, d)
            loc = jnp.argmax(mindist, axis=-1)  # (B,)
            val = jnp.take_along_axis(mindist, loc[:, None], axis=1)[:, 0]
            gidx = (loc + me * nloc).astype(jnp.int32)
            coords = jnp.take_along_axis(x_loc, loc[:, None, None], axis=1)[
                :, 0, :
            ]
            # psum-family reductions (not all_gather): their outputs are
            # replicated in shard_map's VMA type system, so the sampled-index
            # carry stays invariant and can leave with out_specs P()
            best = lax.pmax(val, axis)  # (B,)
            win_idx = lax.pmin(
                jnp.where(val == best, gidx, _INT_MAX), axis
            )  # lowest-index tie-break, matching jnp.argmax
            win_coords = lax.psum(
                jnp.where((gidx == win_idx)[:, None], coords, 0.0), axis
            )
            idxs = lax.dynamic_update_index_in_dim(idxs, win_idx, it, axis=1)
            return mindist, idxs, win_coords

        mindist = jnp.full((B, nloc), 1e10, jnp.float32)
        idxs = jnp.zeros((B, npoint), jnp.int32)
        _, idxs, _ = lax.fori_loop(1, npoint, body_it, (mindist, idxs, last))
        return idxs

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis, None),),
        out_specs=P(),
        check_vma=False,
    )(lax.stop_gradient(xyz))


def _check_div(x, y, p: int, axis: str) -> None:
    assert x.shape[1] % p == 0 and y.shape[1] % p == 0, (
        f"point dims {x.shape[1]}/{y.shape[1]} must divide the "
        f"'{axis}' axis ({p} devices)"
    )
