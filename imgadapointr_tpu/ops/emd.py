"""Approximate Earth Mover's Distance via the auction algorithm (pure XLA).

Functional equivalent of the reference CUDA extension
(extensions/emd/emd_cuda.cu:23-284, python wrapper emd_module.py:31-95):
an (eps, iterations)-parameterised auction assignment between two
equal-sized clouds; returns per-point squared assignment distances (the
metric then takes ``mean(sqrt(dist))``, utils/metrics.py:112-116) and the
assignment indices. Gradient flows to ``xyz1`` only (matching the CUDA op).

Design — O(N·tile) memory like the CUDA kernel (its header: "memory
complexity: O(n)"): the N×N cost matrix is NEVER materialised. Each auction
iteration scans the items in tiles, computing ``value_ij = -|x_i - y_j|² -
price_j`` on the fly (the -2x·y term is an MXU matmul at HIGHEST precision)
while keeping a running (best, second-best, argbest) per bidder. Item-side
acceptance is a deterministic scatter-max with lowest-bidder-index
tie-break, replacing the CUDA kernel's atomic races. Only unassigned
bidders bid (CUDA parity); bidders still unassigned when iterations run out
are greedily matched to their nearest item (the CUDA version leaves them
at the last partial state — both are approximations controlled by
``iterations``; ours is uniformly closer to the true EMD).

At the test protocol's N=16384 (eps .005, 100 iters, tools/runner.py) peak
temp memory is N·tile·4B ≈ 128 MB instead of the 1 GB dense matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TILE = 2048  # items per inner scan step; peak temp = N * _TILE floats


def _pad_items(y: jax.Array, tile: int):
    """Pad the item cloud to a tile multiple with a far sentinel: padded
    items have hugely negative value and can never win a bid."""
    m = y.shape[0]
    pad = (-m) % tile
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)), constant_values=1e6)
    return y, m


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


def _auction_single(x: jax.Array, y: jax.Array, eps: float, iterations: int,
                    tile: int = _TILE):
    """Auction assignment for one sample; x (N, 3) bidders, y (M, 3) items."""
    N = x.shape[0]
    tile = min(tile, max(y.shape[0], 1))
    y_pad, M = _pad_items(y, tile)
    Mp = y_pad.shape[0]
    T = Mp // tile
    big = jnp.float32(1e9)
    idx = jnp.arange(N, dtype=jnp.int32)

    x32 = x.astype(jnp.float32)
    xsq = jnp.sum(x32 * x32, axis=-1)
    y_tiles = y_pad.astype(jnp.float32).reshape(T, tile, 3)
    ysq_tiles = jnp.sum(y_tiles * y_tiles, axis=-1)
    bases = jnp.arange(T, dtype=jnp.int32) * tile

    def step(carry, _):
        price, assign = carry  # price (Mp,) per item; assign (N,) bidder→item, -1 = none
        best, second, best_item = _tiled_top2(
            x32, xsq, y_tiles, ysq_tiles, bases, price.reshape(T, tile)
        )
        bid = price[best_item] + (best - second) + eps

        unassigned = assign < 0
        # deterministic winner per item: scatter-max of bids, then lowest
        # bidder index among max-bidders breaks ties
        item_best_bid = jnp.full((Mp,), -big).at[best_item].max(
            jnp.where(unassigned, bid, -big)
        )
        is_winner = unassigned & (bid >= item_best_bid[best_item])
        winner_rank = jnp.where(is_winner, idx, N)
        item_winner = jnp.full((Mp,), N, jnp.int32).at[best_item].min(winner_rank)
        won = is_winner & (item_winner[best_item] == idx)

        # evict previous owner of items that just sold
        sold_item_of = jnp.where(won, best_item, Mp)  # per bidder
        sold = jnp.zeros((Mp + 1,), bool).at[sold_item_of].set(True)[:Mp]
        evicted = sold[jnp.clip(assign, 0, Mp - 1)] & (assign >= 0)
        assign = jnp.where(evicted, -1, assign)
        assign = jnp.where(won, best_item, assign)
        price = jnp.where(sold, item_best_bid, price)
        return (price, assign), None

    price0 = jnp.zeros((Mp,), jnp.float32)
    assign0 = jnp.full((N,), -1, jnp.int32)
    (price, assign), _ = jax.lax.scan(
        step, (price0, assign0), None, length=iterations
    )
    # greedy fallback for bidders still unassigned when iterations ran out:
    # nearest item = tiled top-2 at zero price
    _, _, nearest = _tiled_top2(
        x32, xsq, y_tiles, ysq_tiles, bases, jnp.zeros((T, tile), jnp.float32)
    )
    assign = jnp.where(assign < 0, nearest, assign)
    return jnp.minimum(assign, M - 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_auction(xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.005, iterations: int = 50):
    """Returns ``(dist, assignment)``: per-point squared distances (B, N) of
    the auction matching and the matched indices into ``xyz2``."""
    return _emd_forward(xyz1, xyz2, eps, iterations)


def _emd_forward(xyz1, xyz2, eps, iterations):
    assign = jax.vmap(
        lambda a, b: _auction_single(a, b, eps, iterations)
    )(xyz1, xyz2)
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
