"""End-to-end shape/loss/grad tests for AdaPoinTr (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.models import (
    AdaPoinTrBase,
    adapointr_loss,
    cycle_alpha,
    rebuild_factor,
)
from imgadapointr_tpu.models.pctransformer import DENOISE_LENGTH
from imgadapointr_tpu.utils.config import AttrDict

TINY = AttrDict(
    {
        "NAME": "AdaPoinTr",
        "num_query": 16,
        "num_points": 128,
        "center_num": [32, 16],
        "global_feature_dim": 64,
        "encoder_type": "graph",
        "decoder_type": "fc",
        "encoder_config": {
            "embed_dim": 48, "depth": 2, "num_heads": 6, "k": 4, "n_group": 2,
            "mlp_ratio": 2.0, "block_style_list": ["attn-graph", "attn"],
            "combine_style": "concat",
        },
        "decoder_config": {
            "embed_dim": 48, "depth": 2, "num_heads": 6, "k": 4, "n_group": 2,
            "mlp_ratio": 2.0,
            "self_attn_block_style_list": ["attn-deform", "attn"],
            "self_attn_combine_style": "concat",
            "cross_attn_block_style_list": ["attn-graph", "attn"],
            "cross_attn_combine_style": "concat",
        },
    }
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = AdaPoinTrBase(TINY)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (2, 128, 3))
    variables = jax.jit(
        lambda k, x: model.init({"params": k, "noise": k}, x, train=True)
    )(key, xyz)
    return model, variables, xyz


def test_train_forward_shapes(model_and_vars):
    model, variables, xyz = model_and_vars
    ret, _ = jax.jit(
        lambda v, x, k: model.apply(
            v, x, train=True, rngs={"noise": k}, mutable=["batch_stats"]
        )
    )(variables, xyz, jax.random.PRNGKey(1))
    pred_coarse, denoised_coarse, denoised_fine, pred_fine = ret
    f = rebuild_factor(TINY)
    assert pred_coarse.shape == (2, 16, 3)
    assert denoised_coarse.shape == (2, DENOISE_LENGTH, 3)
    assert denoised_fine.shape == (2, DENOISE_LENGTH * f, 3)
    assert pred_fine.shape == (2, 16 * f, 3)


def test_eval_forward_shapes(model_and_vars):
    model, variables, xyz = model_and_vars
    coarse, fine = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, xyz
    )
    assert coarse.shape == (2, 16, 3)
    assert fine.shape == (2, TINY.num_points, 3)
    assert np.isfinite(np.asarray(fine)).all()


def test_loss_and_grad(model_and_vars):
    model, variables, xyz = model_and_vars
    gt = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 3))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    @jax.jit
    def step(p, x, g, k):
        def loss(p):
            ret, _ = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True,
                rngs={"noise": k}, mutable=["batch_stats"],
            )
            ld, lr = adapointr_loss(ret, g, rebuild_factor(TINY))
            return ld + lr, (ld, lr)

        (l, aux), gr = jax.value_and_grad(loss, has_aux=True)(p)
        return l, aux, gr

    l, (ld, lr), gr = step(params, xyz, gt, jax.random.PRNGKey(3))
    assert np.isfinite(float(l)) and float(ld) > 0 and float(lr) > 0

    flat = jax.tree_util.tree_leaves_with_path(gr)
    zero = {jax.tree_util.keystr(p) for p, v in flat if bool(jnp.all(v == 0))}
    # Legitimately gradient-free params, faithful to the reference (which
    # needs find_unused_parameters=True for exactly these,
    # tools/runner.py:89-92):
    # - query_ranking feeds an argsort (AdaPoinTr.py:119-121)
    # - deformable offset nets (linear_offset, proj_v_off) only reach the
    #   loss through pointnet2 three_nn, whose CUDA Function is marked
    #   non-differentiable — interpolation weights are constants to autograd
    allowed = ("query_ranking", "linear_offset", "proj_v_off")
    assert all(any(a in z for a in allowed) for z in zero), zero
    assert sum("query_ranking" in z for z in zero) == 6


def test_variable_loss_alpha_schedule():
    # CycleLR(step=5, max 1, base .01, gamma .995): rises to ~1 at e=5, falls to base at 0/10
    a0 = float(cycle_alpha(0))
    a5 = float(cycle_alpha(5))
    a10 = float(cycle_alpha(10))
    assert abs(a0 - 0.01) < 1e-6
    assert a5 > 0.9
    assert abs(a10 - 0.01) < 1e-6
