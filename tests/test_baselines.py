"""Shape/loss tests for FoldingNet, PCN, TopNet."""

import jax
import numpy as np
import pytest

from imgadapointr_tpu.models.build import build_model_spec
from imgadapointr_tpu.utils.config import AttrDict

CONFIGS = {
    "FoldingNet": {"NAME": "FoldingNet", "num_pred": 1024, "encoder_channel": 256},
    "PCN": {"NAME": "PCN", "num_pred": 1024, "encoder_channel": 256},
    "TopNet": {
        "NAME": "TopNet", "num_pred": 2048, "encoder_feature": 256,
        "node_feature": 8, "nlevels": 6,
    },
}
EXPECTED_FINE = {"FoldingNet": 1024, "PCN": 1024, "TopNet": 2048}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_baseline_forward_and_loss(name):
    cfg = AttrDict(CONFIGS[name])
    spec = build_model_spec(cfg)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (2, 512, 3))
    gt = jax.random.normal(jax.random.PRNGKey(1), (2, EXPECTED_FINE[name], 3))

    variables = jax.jit(
        lambda k, x: spec.module.init({"params": k}, x, train=True)
    )(key, xyz)

    @jax.jit
    def step(v, x, g):
        def loss(p):
            ret, _ = spec.module.apply(
                {"params": p, "batch_stats": v.get("batch_stats", {})},
                x, train=True, mutable=["batch_stats"],
            )
            c, f = spec.loss_fn(ret, g, 0)
            return c + f, ret

        (l, ret), gr = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return l, ret, gr

    l, ret, gr = step(variables, xyz, gt)
    coarse, fine = ret
    assert fine.shape == (2, EXPECTED_FINE[name], 3)
    assert np.isfinite(float(l)) and float(l) > 0
    gnorm = np.sqrt(sum(float((g**2).sum()) for g in jax.tree.leaves(gr)))
    assert np.isfinite(gnorm) and gnorm > 0

    # eval mode works with running stats
    coarse_e, fine_e = jax.jit(
        lambda v, x: spec.module.apply(v, x, train=False)
    )(variables, xyz)
    assert fine_e.shape == (2, EXPECTED_FINE[name], 3)
