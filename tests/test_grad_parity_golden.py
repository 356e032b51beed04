"""Frozen GRADIENT-parity goldens vs the reference torch implementation.

tests/goldens/adapointr_tiny_grad.npz was produced by
parity/run_parity_grad.py: the reference AdaPoinTr (CPU torch, fp64, fixed
seed) ran one full training loss (denoise CD-L1 ×0.5 + CD-L1 coarse+fine,
models/external/AdaPoinTr.py:193-216) and backward; its converted weights,
input, per-parameter gradients, post-step BN running stats and AdamW update
(reference add_weight_decay masking + clip-10, tools/builder.py:37-62 +
runner.py:207-212) are frozen here. This test re-derives OUR side from the
frozen weights and asserts backward-side parity without torch/the reference.

The fp64 harness run proved: losses bit-exact, all 142 gradient blocks
≤ 8.7e-11 rel, BN stats ≤ 1.3e-15, AdamW updates ≤ tol after replicating
torch's clip epsilon. This f32 CI check uses tolerances covering f32
accumulation only — any SEMANTIC backward drift (stop-gradient placement,
masked-softmax grads, decay masking, BN momentum direction) fails it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "adapointr_tiny_grad.npz"
)

# params with analytically-zero gradients: noise-level on both frameworks,
# excluded from relative comparison (see parity/run_parity_grad.py)
ANALYTIC_ZERO = ("increase_dim1/bias", "k_map/bias")
# zero-grad invariant subtrees (argsort / non-differentiable three_nn)
ZERO_GRAD = ("query_ranking", "linear_offset", "proj_v_off")


def _tree_from(data, prefix):
    tree = {}
    for key in data.files:
        if not key.startswith(prefix):
            continue
        path = key[len(prefix):].split("/")
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(data[key])
    return tree


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


@pytest.fixture(scope="module")
def env():
    if not os.path.exists(GOLDEN):
        pytest.skip("grad golden npz missing")
    data = np.load(GOLDEN)

    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "PCN_models",
                     "AdaPoinTr-tiny.yaml")
    )
    spec = build_model_spec(config.model)
    params = _tree_from(data, "param//")
    stats = _tree_from(data, "stats//")

    from imgadapointr_tpu import ops as our_ops

    orig_jitter = our_ops.jitter_points
    our_ops.jitter_points = lambda key, pc, **kw: pc  # golden uses identity
    key = jax.random.PRNGKey(7)
    x = jnp.asarray(data["input"])
    gt = jnp.asarray(data["gt"])
    epoch = float(data["epoch"])
    bnm = float(data["bn_momentum"])

    def loss_fn(p):
        ret, upd = spec.module.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            bn_momentum=bnm, rngs={"noise": key, "dropout": key},
            mutable=["batch_stats"],
        )
        s, d = spec.loss_fn(ret, gt, jnp.asarray(epoch))
        return s + d, (s, d, upd["batch_stats"])

    try:
        (total, (s, d, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
    finally:
        our_ops.jitter_points = orig_jitter
    return config, params, data, (float(s), float(d)), grads, new_bs


def test_loss_values_match_reference(env):
    _, _, data, (s, d), _, _ = env
    np.testing.assert_allclose(s, float(data["loss_sparse"]), rtol=2e-4)
    np.testing.assert_allclose(d, float(data["loss_dense"]), rtol=2e-4)


def test_gradients_match_reference(env):
    _, _, data, _, grads, _ = env
    got = _flat(jax.device_get(grads))
    want = _tree_from(data, "grad//")
    wantf = _flat(want)
    assert set(got) == set(wantf)
    g_global = max(float(np.abs(np.asarray(v)).max()) for v in wantf.values())
    bad = []
    for k in wantf:
        path = "/".join(k)
        a = np.asarray(wantf[k], np.float64)
        b = np.asarray(got[k], np.float64)
        if any(m in path for m in ZERO_GRAD):
            assert np.abs(b).max() == 0.0, f"{path} must be zero-grad"
            continue
        if any(path.endswith(m) or m in path for m in ANALYTIC_ZERO):
            continue
        scale = max(np.abs(a).max(), 1e-6 * g_global)
        delta = np.abs(a - b).max() / scale
        if delta > 5e-3:  # f32 fwd+bwd accumulation headroom
            bad.append((path, delta))
    assert not bad, f"gradient drift: {sorted(bad, key=lambda x: -x[1])[:8]}"


def test_bn_stats_update_matches_reference(env):
    _, _, data, _, _, new_bs = env
    want = _flat(_tree_from(data, "newstats//"))
    got = _flat(jax.device_get(new_bs))
    for k in want:
        a, b = np.asarray(want[k]), np.asarray(got[k])
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=1e-6, err_msg="/".join(k)
        )


def test_adamw_update_matches_reference(env):
    """One optimizer step through OUR builder (decay masking + torch clip
    semantics) must reproduce the reference AdamW update.

    Driven from the FROZEN fp64 gradients, not the f32-recomputed ones:
    first-step Adam is g/(|g|+ε) per element, which amplifies f32 forward
    noise unboundedly on tiny-|g| elements — gradient correctness is
    test_gradients' job; this test isolates the optimizer semantics."""
    import optax

    from imgadapointr_tpu.tools.builder import build_opt_sched

    config, params, data, _, _, _ = env
    grads = jax.tree.map(
        lambda x: x.astype(jnp.float32), _tree_from(data, "grad//")
    )
    tx, _, _ = build_opt_sched(config, 1, params)
    opt_state = jax.jit(tx.init)(params)
    updates, _ = tx.update(grads, opt_state, params)
    got = _flat(jax.device_get(optax.apply_updates(
        jax.tree.map(jnp.zeros_like, params), updates)))
    want = _flat(_tree_from(data, "update//"))
    u_global = max(float(np.abs(np.asarray(v)).max()) for v in want.values())
    bad = []
    for k in want:
        path = "/".join(k)
        a = np.asarray(want[k], np.float64)
        b = np.asarray(got[k], np.float64)
        if any(m in path for m in ZERO_GRAD):
            # reference torch skips None-grad params entirely: no update,
            # no decoupled weight decay — ours must match
            assert np.abs(b).max() == 0.0, f"{path} must get zero update"
            continue
        if np.abs(a).max() < 1e-3 * u_global:
            continue  # noise-grad updates, immaterial (see harness)
        scale = max(np.abs(a).max(), 1e-4 * u_global)
        delta = np.abs(a - b).max() / scale
        if delta > 5e-3:
            bad.append((path, delta))
    assert not bad, f"adamw update drift: {sorted(bad, key=lambda x: -x[1])[:8]}"
