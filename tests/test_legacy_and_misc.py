"""Legacy block API, ball_query, and misc-op coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu import ops
from imgadapointr_tpu.nn import legacy_blocks as lb


def test_ball_query_semantics():
    # 1 query at origin; points on a line
    xyz = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32))[None, :, None] * jnp.ones(
        (1, 11, 3)
    )
    q = jnp.zeros((1, 1, 3))
    idx = np.asarray(ops.ball_query(0.35, 4, xyz, q))[0, 0]
    # in-radius points: |x·√3| <= .35 → x in {0, .1, .2} (0.2·√3≈0.346)
    assert set(idx) <= {0, 1, 2}
    assert idx[0] == 0  # nearest first
    # fewer in-ball than nsample → first point fills the rest
    assert (idx[3:] == idx[0]).all() or len(set(idx)) == 4


def test_ball_query_no_neighbors_falls_back_to_nearest():
    xyz = jnp.ones((1, 5, 3)) * 10.0
    q = jnp.zeros((1, 1, 3))
    idx = np.asarray(ops.ball_query(0.1, 3, xyz, q))
    assert idx.shape == (1, 1, 3)  # falls back to nearest point indices


@pytest.mark.parametrize(
    "cls", [lb.Block, lb.RegionWiseBlock, lb.DeformableAttnBlock, lb.GraphConvBlock]
)
def test_legacy_encoder_blocks(cls):
    key = jax.random.PRNGKey(0)
    m = cls(dim=24, num_heads=4) if cls is not lb.GraphConvBlock else cls(dim=24)
    x = jax.random.normal(key, (2, 16, 24))
    pos = jax.random.normal(key, (2, 16, 3))
    v = m.init(key, x, pos)
    out = m.apply(v, x, pos)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "cls", [lb.DecoderBlock, lb.DeformableAttnDecoderBlock, lb.GraphConvDecoderBlock]
)
def test_legacy_decoder_blocks(cls):
    key = jax.random.PRNGKey(0)
    m = cls(dim=24, num_heads=4)
    q = jax.random.normal(key, (2, 10, 24))
    x = jax.random.normal(key, (2, 16, 24))
    qpos = jax.random.normal(key, (2, 10, 3))
    pos = jax.random.normal(key, (2, 16, 3))
    v = m.init(key, q, x, qpos, pos)
    out = m.apply(v, q, x, qpos, pos)
    assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()


def test_grad_accumulation_matches_big_batch():
    """optax.MultiSteps(k=2) over two half-batches == one full-batch step."""
    import optax

    from imgadapointr_tpu.tools.builder import build_opt_sched
    from imgadapointr_tpu.utils.config import AttrDict

    params = {"w": jnp.ones((4,))}
    base = AttrDict(
        {"optimizer": {"type": "SGD", "kwargs": {"lr": 0.1, "momentum": 0.0,
                                                 "weight_decay": 0.0}},
         "scheduler": {"type": "StepLR", "kwargs": {"step_size": 1000, "gamma": 1.0}},
         "grad_norm_clip": 1e9, "max_epoch": 1}
    )
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0, 4.0])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0, 0.0])}
    gavg = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    tx, _, _ = build_opt_sched(base, 10, params)
    s = tx.init(params)
    up, _ = tx.update(gavg, s, params)
    full = optax.apply_updates(params, up)

    acc_cfg = AttrDict(dict(base, step_per_update=2))
    tx2, _, _ = build_opt_sched(acc_cfg, 10, params)
    s2 = tx2.init(params)
    u1, s2 = tx2.update(g1, s2, params)
    p_mid = optax.apply_updates(params, u1)
    u2, s2 = tx2.update(g2, s2, p_mid)
    accum = optax.apply_updates(p_mid, u2)

    np.testing.assert_allclose(np.asarray(full["w"]), np.asarray(accum["w"]), atol=1e-6)
