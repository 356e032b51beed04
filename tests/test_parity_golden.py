"""Frozen activation-parity goldens vs the reference torch implementation.

tests/goldens/adapointr_tiny.npz was produced by parity/run_parity.py: the
reference AdaPoinTr (models/external/AdaPoinTr.py, CPU torch, fixed seed)
was run on a fixed input; its converted weights and its outputs are frozen
here. This test re-runs OUR flax model from those weights and asserts the
outputs still match — any semantic drift (GELU flavor, tie-breaks, norm
placement, layout) fails it without needing torch or /root/reference.

The fp64 harness run proved bit-level parity (<=3e-15 per stage, eval and
train); this f32 CI check uses tolerances covering f32 accumulation only.
"""

import os

import jax
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "adapointr_tiny.npz")


@pytest.fixture(scope="module")
def golden_env():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden npz missing")
    data = np.load(GOLDEN)

    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "PCN_models",
                     "AdaPoinTr-tiny.yaml")
    )
    spec = build_model_spec(config.model)

    params, stats = {}, {}
    for key in data.files:
        if key.startswith("param//"):
            tree, path = params, key[len("param//"):].split("/")
        elif key.startswith("stats//"):
            tree, path = stats, key[len("stats//"):].split("/")
        else:
            continue
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jax.numpy.asarray(data[key])
    variables = {"params": params, "batch_stats": stats}
    return spec, variables, data


def _rel(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max() / max(np.abs(b).max(), 1e-6)


def test_eval_outputs_match_reference(golden_env):
    spec, variables, data = golden_env
    x = jax.numpy.asarray(data["input"])
    coarse, fine = spec.module.apply(variables, x, train=False)
    assert _rel(coarse, data["ret_coarse"]) < 5e-4
    assert _rel(fine, data["ret_fine"]) < 5e-4


def test_eval_stages_match_reference(golden_env):
    spec, variables, data = golden_env
    x = jax.numpy.asarray(data["input"])
    _, mods = spec.module.apply(
        variables, x, train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    bm = mods["intermediates"]["base_model"]
    _, f = bm["grouper"]["__call__"][0]
    assert _rel(f, data["stage_grouper_f"]) < 5e-4
    assert _rel(bm["encoder"]["__call__"][0], data["stage_encoder"]) < 5e-4
    q, _, _ = bm["__call__"][0]
    assert _rel(q, data["stage_q"]) < 5e-4


def test_train_outputs_match_reference(golden_env, monkeypatch):
    """Denoise-branch parity (train mode, zero-noise jitter as frozen)."""
    spec, variables, data = golden_env
    if "train_pred_fine" not in data.files:
        pytest.skip("golden has no train-mode arrays")
    import imgadapointr_tpu.models.pctransformer as pct

    monkeypatch.setattr(pct.ops, "jitter_points", lambda key, pc, **kw: pc)
    x = jax.numpy.asarray(data["input"])
    ret, _ = spec.module.apply(
        variables, x, train=True,
        rngs={"noise": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        mutable=["batch_stats"],
    )
    pred_coarse, denoised_coarse, denoised_fine, pred_fine = ret
    assert _rel(pred_coarse, data["train_pred_coarse"]) < 5e-4
    assert _rel(denoised_coarse, data["train_denoised_coarse"]) < 5e-4
    assert _rel(pred_fine, data["train_pred_fine"]) < 5e-4
