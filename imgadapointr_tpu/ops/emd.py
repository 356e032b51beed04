"""Approximate Earth Mover's Distance via the auction algorithm.

Functional equivalent of the reference CUDA extension
(extensions/emd/emd_cuda.cu:23-284, python wrapper emd_module.py:31-95):
an (eps, iterations)-parameterised auction assignment between two
equal-sized clouds; returns per-point squared assignment distances (the
metric then takes ``mean(sqrt(dist))``, utils/metrics.py:112-116) and the
assignment indices. Gradient flows to ``xyz1`` only (matching the CUDA op).

Design — O(N·tile) memory like the CUDA kernel (its header: "memory
complexity: O(n)"): the N×N cost matrix is NEVER materialised. Each auction
iteration computes per-bidder (best, second, argbest) of
``value_ij = -|x_i - y_j|² - price_j`` tile-by-tile while keeping a running
top-2; item-side acceptance is a deterministic scatter-max with
lowest-bidder-index tie-break, replacing the CUDA kernel's atomic races.
Only unassigned bidders bid (CUDA parity); bidders still unassigned when
iterations run out are greedily matched to their nearest item (the CUDA
version leaves them at the last partial state — both are approximations
controlled by ``iterations``; ours is uniformly closer to the true EMD).

Two top-2 implementations, auto-dispatched:

- **Pallas fused kernel** (TPU, big clouds — the test protocol's
  N = M = 16384): the value tile never leaves VMEM; per iteration only
  x/y/price stream in and three (N,) vectors stream out. The XLA
  formulation below is HBM-bound at ~6-7 passes over the (N, tile) value
  field per iteration (see ops/pallas/auction.py). Diff-form fp32
  distances. Opt-out: ``IMGADAPOINTR_DISABLE_PALLAS_EMD``.

  The Pallas path additionally runs the iteration loop in TWO PHASES
  (bit-identical to the single-phase scan — gated in
  tests/test_emd_pallas.py): full-width while any sample has more than
  ``p2_width`` unassigned bidders, then a static-width phase whose whole
  per-iteration XLA chain (compaction, bid acceptance, eviction) touches
  O(p2_width) rows via a carried active-row list + owner inverse map
  (``_bid_update_active``). Safe because the unassigned count is monotone
  non-increasing: each sale assigns exactly one bidder and evicts at most
  one. Rationale: TPU gathers/scatters are row-rate bound and run at full
  static shape, so the ~9 O(N)-row ops per iteration dominated the
  converged auction (~104 of 140 ms/sample at the test protocol,
  benchmarks/profile_emd.py); with the phase split + the kernel's 128-row
  sub-block skipping the same protocol runs in ~26 ms/sample.
- **XLA tiled scan** (CPU, small clouds): matmul-form distances at
  HIGHEST precision, top-2 via three linear reductions (``lax.top_k``
  lowers to a sort on TPU and dominated the auction iteration — 10x
  slower at N=16384).

The two differ in distance arithmetic (diff-form vs matmul-form f32), so
near-tie assignments can differ; the auction is an (eps, iterations)
approximation by construction and both paths pass the Hungarian-agreement
gate in tests/test_protocols.py.

At the test protocol's N=16384 (eps .005, 100 iters, tools/runner.py) peak
temp memory is N·tile·4B ≈ 128 MB instead of the 1 GB dense matrix.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from ..utils.envflags import env_flag

_TILE = 2048  # items per inner scan step (XLA path); peak temp = N * _TILE


def _tiled_top2(x32, xsq, y_tiles, ysq_tiles, bases, price_tiles):
    """Per bidder: (best_value, second_value, best_item) of
    value_ij = -|x_i - y_j|^2 - price_j, scanning items in tiles."""
    N = x32.shape[0]
    neg = jnp.float32(-1e30)

    def step(carry, inp):
        best, second, best_i = carry
        yt, yts, pt, base = inp  # (tile, 3), (tile,), (tile,), ()
        # HIGHEST precision: assignment quality hinges on small distance
        # differences that bf16 matmuls would wash out.
        d = (
            xsq[:, None]
            - 2.0
            * jnp.einsum(
                "nc,tc->nt", x32, yt,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + yts[None, :]
        )
        v = -d - pt[None, :]  # (N, tile)
        # top-2 via three linear reductions — lax.top_k lowers to a sort on
        # TPU and dominated the auction iteration (10x slower at N=16384)
        c1 = jnp.max(v, axis=1)
        c1i_local = jnp.argmax(v, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        c2 = jnp.max(jnp.where(cols == c1i_local[:, None], neg, v), axis=1)
        c1i = c1i_local + base
        upd = c1 > best
        second = jnp.where(upd, jnp.maximum(best, c2), jnp.maximum(second, c1))
        best = jnp.where(upd, c1, best)
        best_i = jnp.where(upd, c1i, best_i)
        # barrier: the reduce→broadcast→where chains above otherwise feed
        # XLA's fusion search across tile steps and iterations — compile
        # time at N=16384 ballooned to ~8 min; the carry is only O(N)
        return jax.lax.optimization_barrier((best, second, best_i)), None

    init = (
        jnp.full((N,), neg), jnp.full((N,), neg), jnp.zeros((N,), jnp.int32)
    )
    (best, second, best_i), _ = jax.lax.scan(
        step, init, (y_tiles, ysq_tiles, price_tiles, bases)
    )
    return best, second, best_i


def _bid_update(price, assign, best, second, best_item, *, eps: float):
    """One sample's item-side auction update: accept the winning bid per
    item (deterministic scatter-max, lowest-bidder-index tie-break), evict
    previous owners of items that just sold, raise sold items' prices."""
    N = assign.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    return _bid_update_rows(
        price, assign, best, second, best_item, idx, assign < 0, eps=eps
    )


def _bid_update_rows(price, assign, best, second, best_item, orig, valid, *,
                     eps: float):
    """Row-indexed variant: the top-2 rows may be a COMPACTED view of the
    bidders. ``orig`` (R,) maps row → original bidder index (ascending among
    valid rows, so the lowest-bidder-index tie-break is identical to the
    uncompacted form); ``valid`` (R,) masks live rows. With
    ``orig = arange(N), valid = assign < 0`` this is exactly the
    uncompacted update."""
    N = assign.shape[0]
    M = price.shape[0]
    big = jnp.float32(1e9)
    bid = price[best_item] + (best - second) + eps

    item_best_bid = jnp.full((M,), -big).at[best_item].max(
        jnp.where(valid, bid, -big)
    )
    is_winner = valid & (bid >= item_best_bid[best_item])
    winner_rank = jnp.where(is_winner, orig, N)
    item_winner = jnp.full((M,), N, jnp.int32).at[best_item].min(winner_rank)
    won = is_winner & (item_winner[best_item] == orig)

    # evict previous owner of items that just sold
    sold_item_of = jnp.where(won, best_item, M)  # per row
    sold = jnp.zeros((M + 1,), bool).at[sold_item_of].set(True)[:M]
    evicted = sold[jnp.clip(assign, 0, M - 1)] & (assign >= 0)
    assign = jnp.where(evicted, -1, assign)
    # scatter winning rows' items back to their original bidder slots
    # (out-of-range sentinel rows are dropped by JAX scatter semantics)
    assign = assign.at[jnp.where(won, orig, N)].set(
        best_item, mode="drop"
    )
    price = jnp.where(sold, item_best_bid, price)
    return price, assign


def _bid_update_active(price, assign, owner, active, valid, best, second,
                       best_item, *, eps: float, n: int):
    """Phase-2 auction update over a CARRIED compacted active-row view.

    ``active`` (W,) holds the original bidder ids of the live rows in its
    first ``cnt`` slots (sentinel ``n`` after); ``owner`` (M,) is the
    inverse of ``assign`` (owner[j] = bidder assigned to item j, sentinel
    ``n``). Semantically identical to ``_bid_update_rows`` — every row
    reduction (scatter-max of f32 bids, scatter-min of original bidder
    rank) is order-invariant, so the carried row order (survivors first,
    then this round's evictions) cannot change results; gated bit-exact
    against the single-phase path in tests/test_emd_pallas.py. Everything
    here is O(W) scatter/gather rows + O(M) elementwise — no O(N)-row op,
    which is the point: TPU gathers/scatters are row-rate bound and the
    XLA chain around the kernel dominated the auction at full static N
    (benchmarks/profile_emd.py)."""
    M = price.shape[0]
    W = active.shape[0]
    big = jnp.float32(1e9)
    orig = active
    bid = price[best_item] + (best - second) + eps

    item_best_bid = jnp.full((M,), -big).at[best_item].max(
        jnp.where(valid, bid, -big)
    )
    is_winner = valid & (bid >= item_best_bid[best_item])
    winner_rank = jnp.where(is_winner, orig, n)
    item_winner = jnp.full((M,), n, jnp.int32).at[best_item].min(winner_rank)
    won = is_winner & (item_winner[best_item] == orig)

    sold_item = jnp.where(won, best_item, M)  # sentinel M: dropped below
    # evicted previous owner of each item that just sold (sentinel n: none)
    prev_owner = jnp.where(won, owner[best_item], n)
    owner = owner.at[sold_item].set(jnp.where(won, orig, n), mode="drop")
    assign = assign.at[jnp.where(won, orig, n)].set(best_item, mode="drop")
    assign = assign.at[prev_owner].set(-1, mode="drop")
    sold = jnp.zeros((M + 1,), bool).at[sold_item].set(True)[:M]
    price = jnp.where(sold, item_best_bid, price)

    # next active rows: survivors (live, didn't win) then this round's
    # evictions. The unassigned count is monotone non-increasing (each
    # sale assigns exactly one bidder and evicts at most one), so once it
    # fits in W slots it fits forever.
    cand = jnp.concatenate([jnp.where(valid & ~won, orig, n), prev_owner])
    live = cand < n
    pos = (jnp.cumsum(live) - 1).astype(jnp.int32)
    active = (
        jnp.full((W,), n, jnp.int32)
        .at[jnp.where(live, pos, 2 * W)]
        .set(cand, mode="drop")
    )
    cnt = jnp.sum(live).astype(jnp.int32)
    return price, assign, owner, active, cnt


def _use_pallas_top2(x: jax.Array, y: jax.Array) -> bool:
    # one remote Mosaic compile per distinct shape: gate to the big-cloud
    # regime where the HBM saving dominates (the test protocol's 16384²)
    N, M = x.shape[1], y.shape[1]
    return (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.float32
        and y.dtype == jnp.float32
        and N >= 1024
        and M >= 1024
        and N * M >= 1 << 22
        and not env_flag("IMGADAPOINTR_DISABLE_PALLAS_EMD")
    )


def _auction_batch(x, y, eps: float, iterations: int,
                   use_pallas: bool, interpret: bool = False,
                   tile: int = _TILE, p2_width: int = 1024):
    """Batched auction assignment: x (B, N, 3) bidders, y (B, M, 3) items
    → (B, N) int32 assignment into y.

    Pallas path with N > ``p2_width`` runs in two phases: full-width
    iterations while any sample still has > p2_width unassigned bidders,
    then a static-width-``p2_width`` phase whose whole per-iteration XLA
    chain (compaction, bid acceptance, eviction) touches O(p2_width) rows
    via a carried active-row list (``_bid_update_active``). Bit-identical
    to the single-phase scan; the phases only shrink the *view*."""
    B, N, _ = x.shape
    M = y.shape[1]
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)

    idxs = jnp.arange(N, dtype=jnp.int32)

    if use_pallas:
        from .pallas.auction import auction_top2_pallas

        def step(carry, _):
            # CUDA parity (calc_unass_idx, emd_cuda.cu:55-84): compact the
            # unassigned bidders to the front so the kernel skips whole
            # blocks of already-assigned bidders — per-iteration cost
            # scales with the unassigned count, which collapses
            # geometrically as the auction converges.
            price, assign = carry  # (B, M), (B, N)
            mask = assign < 0
            cnt = jnp.sum(mask, axis=1).astype(jnp.int32)  # (B,)
            pos = (jnp.cumsum(mask, axis=1) - 1).astype(jnp.int32)
            compact = jax.vmap(
                lambda m, p: jnp.zeros((N,), jnp.int32)
                .at[jnp.where(m, p, N)]
                .set(idxs, mode="drop")
            )(mask, pos)  # (B, N): original ids of active rows, ascending
            xg = jnp.take_along_axis(x32, compact[..., None], axis=1)
            best, second, best_item = auction_top2_pallas(
                xg, y32, price, cnt=cnt, interpret=interpret
            )
            valid = idxs[None, :] < cnt[:, None]
            price, assign = jax.vmap(
                functools.partial(_bid_update_rows, eps=eps)
            )(price, assign, best, second, best_item, compact, valid)
            return (price, assign), None

        def top2(price):  # all-rows variant (greedy fallback only)
            return auction_top2_pallas(x32, y32, price, interpret=interpret)
    else:
        tile = min(tile, max(M, 1))
        pad = (-M) % tile
        y_pad = jnp.pad(y32, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
        Mp = M + pad
        T = Mp // tile
        y_tiles = y_pad.reshape(B, T, tile, 3)
        ysq_tiles = jnp.sum(y_tiles * y_tiles, axis=-1)
        bases = jnp.arange(T, dtype=jnp.int32) * tile
        xsq = jnp.sum(x32 * x32, axis=-1)

        def top2(price):
            pt = jnp.pad(price, ((0, 0), (0, pad))).reshape(B, T, tile)
            best, second, best_i = jax.vmap(
                _tiled_top2, in_axes=(0, 0, 0, 0, None, 0)
            )(x32, xsq, y_tiles, ysq_tiles, bases, pt)
            return best, second, jnp.minimum(best_i, M - 1)

        update = jax.vmap(functools.partial(_bid_update, eps=eps))

        def step(carry, _):
            price, assign = carry  # (B, M), (B, N)
            best, second, best_item = top2(price)
            price, assign = update(price, assign, best, second, best_item)
            return (price, assign), None

    price0 = jnp.zeros((B, M), jnp.float32)
    assign0 = jnp.full((B, N), -1, jnp.int32)

    if use_pallas and N > p2_width:
        from .pallas.auction import auction_top2_pallas

        W2 = p2_width
        slot = jnp.arange(W2, dtype=jnp.int32)

        def p1_cond(c):
            _, assign, it = c
            return (it < iterations) & (
                jnp.max(jnp.sum(assign < 0, axis=1)) > W2
            )

        def p1_body(c):
            price, assign, it = c
            (price, assign), _ = step((price, assign), None)
            return jax.lax.optimization_barrier(
                (price, assign, it + jnp.int32(1))
            )

        price, assign, it = jax.lax.while_loop(
            p1_cond, p1_body, (price0, assign0, jnp.int32(0))
        )

        # phase transition: build the compacted active list (original
        # bidder ids of the unassigned rows, front-packed) and the owner
        # inverse of assign — the ONLY O(N)-row work phase 2 ever pays.
        # If phase 1 exhausted the budget with > W2 unassigned, phase 2's
        # cond is False and these are dead values.
        mask = assign < 0
        cnt = jnp.sum(mask, axis=1).astype(jnp.int32)
        pos = (jnp.cumsum(mask, axis=1) - 1).astype(jnp.int32)
        active = jax.vmap(
            lambda m, p: jnp.full((W2,), N, jnp.int32)
            .at[jnp.where(m, p, W2)]
            .set(idxs, mode="drop")
        )(mask, pos)
        owner = jax.vmap(
            lambda a: jnp.full((M,), N, jnp.int32)
            .at[jnp.where(a >= 0, a, M)]
            .set(idxs, mode="drop")
        )(assign)

        def p2_cond(c):
            _, _, _, _, cnt, it = c
            return (it < iterations) & (jnp.max(cnt) > 0)

        def p2_body(c):
            price, assign, owner, active, cnt, it = c
            xg = jnp.take_along_axis(
                x32, jnp.minimum(active, N - 1)[..., None], axis=1
            )
            # sub-block skipping inside the kernel makes the sweep cost
            # ceil(cnt/128)·128 rows × M — at the observed late-auction
            # counts (~60) that is 8× less VPU work than a full W2 block
            best, second, best_item = auction_top2_pallas(
                xg, y32, price, cnt=cnt, interpret=interpret
            )
            valid = slot[None, :] < cnt[:, None]
            price, assign, owner, active, cnt = jax.vmap(
                functools.partial(_bid_update_active, eps=eps, n=N)
            )(price, assign, owner, active, valid, best, second, best_item)
            return jax.lax.optimization_barrier(
                (price, assign, owner, active, cnt, it + jnp.int32(1))
            )

        price, assign, _, _, _, _ = jax.lax.while_loop(
            p2_cond, p2_body, (price, assign, owner, active, cnt, it)
        )
    else:
        (price, assign), _ = jax.lax.scan(
            step, (price0, assign0), None, length=iterations
        )
    # greedy fallback for bidders still unassigned when iterations ran out:
    # nearest item = top-2 at zero price. Skipped entirely (lax.cond) when
    # the auction fully converged — the full-width top-2 pass is ~4 ms at
    # the 16384² protocol shape and pure waste then.
    def _greedy(a):
        _, _, nearest = top2(jnp.zeros((B, M), jnp.float32))
        return jnp.where(a < 0, nearest, a)

    assign = jax.lax.cond(
        jnp.any(assign < 0), _greedy, lambda a: a, assign
    )
    return jnp.minimum(assign, M - 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_auction(xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.005, iterations: int = 50):
    """Returns ``(dist, assignment)``: per-point squared distances (B, N) of
    the auction matching and the matched indices into ``xyz2``."""
    return _emd_forward(xyz1, xyz2, eps, iterations)


def _emd_forward(xyz1, xyz2, eps, iterations):
    assign = _auction_batch(
        xyz1, xyz2, eps, iterations, use_pallas=_use_pallas_top2(xyz1, xyz2)
    )
    matched = jnp.take_along_axis(xyz2, assign[..., None], axis=1)
    dist = jnp.sum((xyz1.astype(jnp.float32) - matched.astype(jnp.float32)) ** 2, axis=-1)
    return dist, assign


def _emd_fwd(xyz1, xyz2, eps, iterations):
    dist, assign = _emd_forward(xyz1, xyz2, eps, iterations)
    return (dist, assign), (xyz1, xyz2, assign)


def _emd_bwd(eps, iterations, res, grads):
    xyz1, xyz2, assign = res
    g_dist, _ = grads
    matched = jnp.take_along_axis(xyz2, assign[..., None], axis=1)
    # d/dxyz1 |x1 - x2[a]|^2 = 2 (x1 - x2[a]); grad only w.r.t. xyz1
    # (reference emd_module.py:60-72 returns None for xyz2)
    g1 = 2.0 * (xyz1 - matched) * g_dist[..., None]
    return g1.astype(xyz1.dtype), jnp.zeros_like(xyz2)


emd_auction.defvjp(_emd_fwd, _emd_bwd)


def emd_distance_metric(pred, gt, eps: float = 0.005, iterations: int = 100):
    """``mean(sqrt(dist))`` (×1000 applied by the caller) — reference
    utils/metrics.py:112-116."""
    dist, _ = emd_auction(pred, gt, eps, iterations)
    return jnp.mean(jnp.sqrt(jnp.maximum(dist, 0.0)))
