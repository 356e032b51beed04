"""Multi-device tests on the virtual 8-CPU mesh (the fake backend the
reference never had — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    param_sharding_rules,
    shard_batch,
)


def test_mesh_shapes():
    assert jax.device_count() == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(tp=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_batch_sharded_over_data_axis():
    mesh = make_mesh(tp=1)
    batch = {"partial": np.ones((8, 16, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["partial"].sharding.num_devices == 8


def test_dp_train_step_matches_single_device():
    """One optimizer step on the 8-device mesh must equal the single-device
    step (gradient averaging via the sharded batch axis)."""
    import optax

    from imgadapointr_tpu.models import AdaPoinTrBase, adapointr_loss, rebuild_factor
    from imgadapointr_tpu.utils.config import AttrDict

    cfg = AttrDict(
        {
            "NAME": "AdaPoinTr", "num_query": 16, "num_points": 128,
            "center_num": [32, 16], "global_feature_dim": 64,
            "encoder_type": "graph", "decoder_type": "fc",
            "encoder_config": {
                "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                "n_group": 2, "mlp_ratio": 2.0,
                "block_style_list": ["attn"], "combine_style": "concat",
            },
            "decoder_config": {
                "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                "n_group": 2, "mlp_ratio": 2.0,
                "self_attn_block_style_list": ["attn"],
                "self_attn_combine_style": "concat",
                "cross_attn_block_style_list": ["attn"],
                "cross_attn_combine_style": "concat",
            },
        }
    )
    model = AdaPoinTrBase(cfg)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (8, 128, 3))
    gt = jax.random.normal(jax.random.PRNGKey(1), (8, 128, 3))
    variables = jax.jit(
        lambda k, x: model.init({"params": k, "noise": k}, x, train=True)
    )(key, xyz)
    factor = rebuild_factor(cfg)
    tx = optax.adamw(1e-3)

    def step(params, bstats, xyz, gt, rng):
        def loss(p):
            ret, _ = model.apply(
                {"params": p, "batch_stats": bstats}, xyz, train=True,
                rngs={"noise": rng}, mutable=["batch_stats"],
            )
            s, d = adapointr_loss(ret, gt, factor)
            return s + d

        return jax.value_and_grad(loss)(params)

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(2)

    # single device
    l1, g1 = jax.jit(step)(params, bstats, xyz, gt, rng)

    # 8-device dp
    mesh = make_mesh(tp=1)
    p_shard = param_sharding_rules(params, mesh)
    params_s = jax.device_put(params, p_shard)
    batch = shard_batch({"partial": xyz, "gt": gt}, mesh)
    with mesh:
        l8, g8 = jax.jit(step)(
            params_s, bstats, batch["partial"], batch["gt"], rng
        )

    # loss + gradients must match up to cross-shard summation order
    # (one-optimizer-step param comparison is ill-conditioned: adamw's first
    # update is ~lr·sign(g), which flips wherever g ≈ 0)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        scale = max(1e-3, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
        )


def test_tp_shards_large_kernels():
    mesh = make_mesh(tp=2)
    params = {"big": jnp.zeros((512, 512)), "small": jnp.zeros((4, 4)), "vec": jnp.zeros((512,))}
    rules = param_sharding_rules(params, mesh, min_size=0)
    assert MODEL_AXIS in str(rules["big"].spec)
    assert MODEL_AXIS not in str(rules["small"].spec) or params["small"].shape[-1] % 2 == 0
    assert MODEL_AXIS not in str(rules["vec"].spec)


def test_tp2_loss_and_grads_match_single_device():
    """GSPMD correctness: sharding kernels over the 'model' axis (tp=2,
    dp=4) must leave loss and gradients numerically unchanged — the
    collectives XLA inserts are exact reorderings."""
    from imgadapointr_tpu.models import AdaPoinTrBase, adapointr_loss, rebuild_factor
    from imgadapointr_tpu.utils.config import AttrDict

    cfg = AttrDict(
        {
            "NAME": "AdaPoinTr", "num_query": 16, "num_points": 128,
            "center_num": [32, 16], "global_feature_dim": 64,
            "encoder_type": "graph", "decoder_type": "fc",
            "encoder_config": {
                "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                "n_group": 2, "mlp_ratio": 2.0,
                "block_style_list": ["attn"], "combine_style": "concat",
            },
            "decoder_config": {
                "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                "n_group": 2, "mlp_ratio": 2.0,
                "self_attn_block_style_list": ["attn"],
                "self_attn_combine_style": "concat",
                "cross_attn_block_style_list": ["attn"],
                "cross_attn_combine_style": "concat",
            },
        }
    )
    model = AdaPoinTrBase(cfg)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (8, 128, 3))
    gt = jax.random.normal(jax.random.PRNGKey(1), (8, 128, 3))
    variables = jax.jit(
        lambda k, x: model.init({"params": k, "noise": k}, x, train=True)
    )(key, xyz)
    factor = rebuild_factor(cfg)

    def step(params, bstats, xyz, gt, rng):
        def loss(p):
            ret, _ = model.apply(
                {"params": p, "batch_stats": bstats}, xyz, train=True,
                rngs={"noise": rng}, mutable=["batch_stats"],
            )
            s, d = adapointr_loss(ret, gt, factor)
            return s + d

        return jax.value_and_grad(loss)(params)

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(2)
    l1, g1 = jax.jit(step)(params, bstats, xyz, gt, rng)

    mesh = make_mesh(tp=2)  # 4 dp x 2 tp over the 8 virtual devices
    p_shard = param_sharding_rules(params, mesh, min_size=1 << 10)
    params_s = jax.device_put(params, p_shard)
    batch = shard_batch({"partial": xyz, "gt": gt}, mesh)
    with mesh:
        l2, g2 = jax.jit(step)(params_s, bstats, batch["partial"], batch["gt"], rng)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = max(1e-3, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
        )
