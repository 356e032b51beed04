"""Approximate Earth Mover's Distance via the auction algorithm (pure XLA).

Functional equivalent of the reference CUDA extension
(extensions/emd/emd_cuda.cu:23-284, python wrapper emd_module.py:31-95):
an (eps, iterations)-parameterised auction assignment between two
equal-sized clouds; returns per-point squared assignment distances (the
metric then takes ``mean(sqrt(dist))``, utils/metrics.py:112-116) and the
assignment indices. Gradient flows to ``xyz1`` only (matching the CUDA op).

Design: a fixed-iteration ``lax.scan`` auction. Each step every unassigned
bidder bids ``price[best] + (v1 - v2) + eps`` on its best item; items accept
the highest bid (deterministic scatter-max with index tie-break, replacing
the CUDA kernel's atomic races). Bidders left unassigned when iterations run
out are greedily matched to their cheapest item (the CUDA version leaves
them at the last partial state; both are approximations controlled by
``iterations``). EMD is an eval-time metric (tools/runner.py:522-621), so
throughput matters less than determinism.

Memory: the N×N cost matrix is materialised per sample (1 GB at N=16384
fp32); evaluation runs at batch 1 like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pointops import square_distance


def _auction_single(C: jax.Array, eps: float, iterations: int):
    """Auction assignment for one sample. C: (N, N) bidder→item cost."""
    N = C.shape[0]
    big = jnp.float32(1e9)
    idx = jnp.arange(N, dtype=jnp.int32)

    def step(carry, _):
        price, assign = carry  # price (N,) per item; assign (N,) bidder→item, -1 = none
        value = -C - price[None, :]  # (N bidders, N items)
        top2, top2i = jax.lax.top_k(value, 2)
        best_item = top2i[:, 0].astype(jnp.int32)
        bid = price[best_item] + (top2[:, 0] - top2[:, 1]) + eps

        unassigned = assign < 0
        # deterministic winner per item: scatter-max of bids, then lowest
        # bidder index among max-bidders breaks ties
        item_best_bid = jnp.full((N,), -big).at[best_item].max(
            jnp.where(unassigned, bid, -big)
        )
        is_winner = unassigned & (bid >= item_best_bid[best_item] - 0.0)
        # tie-break: among winners of the same item keep the smallest bidder idx
        winner_rank = jnp.where(is_winner, idx, N)
        item_winner = jnp.full((N,), N, jnp.int32).at[best_item].min(winner_rank)
        won = is_winner & (item_winner[best_item] == idx)

        # evict previous owner of items that just sold
        sold_item_of = jnp.where(won, best_item, N)  # per bidder
        sold = jnp.zeros((N + 1,), bool).at[sold_item_of].set(True)[:N]
        evicted = sold[jnp.clip(assign, 0, N - 1)] & (assign >= 0)
        assign = jnp.where(evicted, -1, assign)
        assign = jnp.where(won, best_item, assign)
        price = jnp.where(sold, item_best_bid, price)
        return (price, assign), None

    price0 = jnp.zeros((N,), jnp.float32)
    assign0 = jnp.full((N,), -1, jnp.int32)
    (price, assign), _ = jax.lax.scan(
        step, (price0, assign0), None, length=iterations
    )
    # greedy fallback for bidders still unassigned when iterations ran out
    fallback = jnp.argmin(C, axis=1).astype(jnp.int32)
    assign = jnp.where(assign < 0, fallback, assign)
    return assign


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_auction(xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.005, iterations: int = 50):
    """Returns ``(dist, assignment)``: per-point squared distances (B, N) of
    the auction matching and the matched indices into ``xyz2``."""
    return _emd_forward(xyz1, xyz2, eps, iterations)


def _emd_forward(xyz1, xyz2, eps, iterations):
    C = square_distance(xyz1, xyz2)  # (B, N, N)
    assign = jax.vmap(lambda c: _auction_single(c, eps, iterations))(C)
    matched = jnp.take_along_axis(xyz2, assign[..., None], axis=1)
    dist = jnp.sum((xyz1 - matched) ** 2, axis=-1)
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
