"""Shape/loss tests for SnowFlakeNet and GRNet (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from imgadapointr_tpu.models.build import build_model_spec
from imgadapointr_tpu.utils.config import AttrDict


def test_snowflakenet():
    cfg = AttrDict(
        {
            "NAME": "SnowFlakeNet", "dim_feat": 128, "num_pc": 64,
            "num_p0": 128, "radius": 1, "up_factors": [2, 2],
        }
    )
    spec = build_model_spec(cfg)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (2, 256, 3))
    gt = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 3))
    v = jax.jit(lambda k, x: spec.module.init({"params": k}, x, train=True))(key, xyz)

    @jax.jit
    def step(v, x, g):
        def loss(p):
            ret, _ = spec.module.apply(
                {"params": p, "batch_stats": v.get("batch_stats", {})},
                x, train=True, mutable=["batch_stats"],
            )
            s, d = spec.loss_fn(ret, g, 0)
            return s + d, tuple(r.shape for r in ret)

        (l, shapes), gr = jax.value_and_grad(loss, has_aux=True)(v["params"])
        import optax

        return l, shapes, optax.global_norm(gr)

    l, shapes, gn = step(v, xyz, gt)
    # train: (Pc 64, P1 128, P2 256, P3 512, partial 256)
    assert [s[1] for s in shapes] == [64, 128, 256, 512, 256]
    assert np.isfinite(float(l)) and float(gn) > 0

    p1, p3 = jax.jit(lambda v, x: spec.module.apply(v, x, train=False))(v, xyz)
    assert p1.shape == (2, 128, 3) and p3.shape == (2, 512, 3)


def test_grnet():
    cfg = AttrDict(
        {"NAME": "GRNet", "num_pred": 2048,
         "gridding_loss_scales": 64, "gridding_loss_alphas": 0.1}
    )
    spec = build_model_spec(cfg)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (1, 512, 3), minval=-0.9, maxval=0.9)
    gt = jax.random.uniform(jax.random.PRNGKey(1), (1, 2048, 3), minval=-0.9, maxval=0.9)
    v = jax.jit(
        lambda k, x: spec.module.init({"params": k, "noise": k}, x, train=True)
    )(key, xyz)

    @jax.jit
    def step(v, x, g, k):
        def loss(p):
            ret, _ = spec.module.apply(
                {"params": p, "batch_stats": v.get("batch_stats", {})},
                x, train=True, rngs={"noise": k}, mutable=["batch_stats"],
            )
            s, d = spec.loss_fn(ret, g, 0)
            return s + d, tuple(r.shape for r in ret)

        (l, shapes), gr = jax.value_and_grad(loss, has_aux=True)(v["params"])
        import optax

        return l, shapes, optax.global_norm(gr)

    l, shapes, gn = step(v, xyz, gt, jax.random.PRNGKey(2))
    assert shapes == ((1, 256, 3), (1, 2048, 3))
    assert np.isfinite(float(l)) and float(gn) > 0

    sparse, dense = jax.jit(lambda v, x: spec.module.apply(v, x, train=False))(v, xyz)
    assert dense.shape == (1, 2048, 3)
    assert np.isfinite(np.asarray(dense)).all()


def test_grnet_eval_sampling_knob():
    """`eval_sampling: fixed` (default) gives run-to-run identical eval
    outputs; `eval_sampling: random` + a 'noise' rng follows the
    reference's unseeded eval RandomPointSampling
    (models/external/GRNet.py:21-42). Without the rng, 'random' safely
    falls back to the fixed key."""
    base = {"NAME": "GRNet", "num_pred": 2048}
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (1, 512, 3), minval=-0.9, maxval=0.9)

    spec = build_model_spec(AttrDict(base))
    v = jax.jit(
        lambda k, x: spec.module.init({"params": k, "noise": k}, x, train=True)
    )(key, xyz)

    ev = jax.jit(lambda v, x: spec.module.apply(v, x, train=False)[1])
    a, b = ev(v, xyz), ev(v, xyz)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    spec_r = build_model_spec(AttrDict(dict(base, eval_sampling="random")))
    ev_r = jax.jit(
        lambda v, x, k: spec_r.module.apply(v, x, train=False, rngs={"noise": k})[1]
    )
    r1 = ev_r(v, xyz, jax.random.PRNGKey(10))
    r2 = ev_r(v, xyz, jax.random.PRNGKey(11))
    assert not np.array_equal(np.asarray(r1), np.asarray(r2))
    # no rng passed → falls back to the fixed key (no crash, deterministic)
    f = jax.jit(lambda v, x: spec_r.module.apply(v, x, train=False)[1])(v, xyz)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(a))
