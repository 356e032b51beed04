"""Frozen GRADIENT-parity goldens for the SUPERSET seg model
(ImgEncSegDecAdaPoinTrVariableLoss) vs the reference torch implementation.

tests/goldens/imgsegdec_tiny384_grad.npz was produced by
parity/run_parity_grad.py --model imgsegdec: the reference model
(models/internal/ImgEncSegDecAdaPoinTrVariableLoss.py, CPU torch, fp64,
fixed seed, frozen GDANet pinned to eval) ran one full variable-loss
training step and backward; its converted weights, inputs (xyz + image +
cls one-hot), captured reference normals, per-parameter gradients,
post-step BN running stats and AdamW update (frozen segmentator excluded
from the optimizer AND the clip norm, reference runner.py:55-66) are
frozen here. This test re-derives OUR side from the frozen weights and
asserts backward-side parity without torch/the reference.

Seg-specific semantics this locks down (beyond test_grad_parity_golden):
- gradient flows THROUGH the frozen GDANet into the coarse cloud (the
  reference never sets requires_grad=False before backward — grads exist
  on segmentator params but are never applied),
- the normals path d(loss)/d(coarse) stays live (reference does not
  detach pytorch3d normals); signs are solver-arbitrary, so CI re-runs
  live normals sign-aligned to the captured reference normals,
- frozen-subtree updates are EXACTLY zero and frozen grads are excluded
  from the global-norm clip (tools/builder.py frozen mask BEFORE clip),
- the variable-loss alpha table (shifted CycleLR) in the backward.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "imgsegdec_tiny384_grad.npz"
)
CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "cfgs", "SegImgPCN_models",
    "ImgEncSegDec-tiny384.yaml",
)

# zero-grad invariant subtrees (argsort / non-differentiable three_nn)
ZERO_GRAD = ("query_ranking", "linear_offset", "proj_v_off")
# frozen GDANet: grads EXIST (flow-through, validated against torch) but the
# optimizer update must be exactly zero
FROZEN = ("segmentator",)


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
        pytest.skip("imgsegdec grad golden npz missing")
    data = np.load(GOLDEN)

    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file(CONFIG)
    spec = build_model_spec(config.model)
    params = _tree_from(data, "param//")
    stats = _tree_from(data, "stats//")

    import imgadapointr_tpu.models.seg_adapointr as seg_mod
    from imgadapointr_tpu import ops as our_ops
    from imgadapointr_tpu.ops.normals import (
        estimate_pointcloud_normals as live_normals,
    )

    # live normals, sign-aligned to the captured reference normals (the
    # eigenvector sign is solver-arbitrary; locally the normal is a smooth
    # unique function of the points, so aligned values AND grads must match)
    norm_ref = jnp.asarray(data["norm_ref"])

    def aligned_normals(coor, k):
        n = live_normals(coor, k)
        s = jnp.where(jnp.sum(n * norm_ref, -1, keepdims=True) >= 0, 1.0, -1.0)
        return n * s

    orig_norm = seg_mod.estimate_pointcloud_normals
    orig_jitter = our_ops.jitter_points
    seg_mod.estimate_pointcloud_normals = aligned_normals
    our_ops.jitter_points = lambda key, pc, **kw: pc  # golden uses identity

    key = jax.random.PRNGKey(7)
    x = jnp.asarray(data["input"])
    img = jnp.asarray(data["input_img"])
    cls_vec = jnp.asarray(data["input_cls"])
    gt = jnp.asarray(data["gt"])
    epoch = float(data["epoch"])
    bnm = float(data["bn_momentum"])

    def loss_fn(p):
        ret, upd = spec.module.apply(
            {"params": p, "batch_stats": stats}, x, img, cls_vec, train=True,
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
        seg_mod.estimate_pointcloud_normals = orig_norm
        our_ops.jitter_points = orig_jitter
    return config, spec, params, data, (float(s), float(d)), grads, new_bs


def test_loss_values_match_reference(env):
    _, _, _, data, (s, d), _, _ = env
    np.testing.assert_allclose(s, float(data["loss_sparse"]), rtol=5e-4)
    np.testing.assert_allclose(d, float(data["loss_dense"]), rtol=5e-4)


def test_gradients_match_reference(env):
    _, _, _, data, _, grads, _ = env
    got = _flat(jax.device_get(grads))
    wantf = _flat(_tree_from(data, "grad//"))
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
        # frozen GDANet grads ARE compared: flow-through gradient semantics
        scale = max(np.abs(a).max(), 1e-5 * g_global)
        delta = np.abs(a - b).max() / scale
        # f32 fwd+bwd through ResNet18 + GDANet + normals: wider headroom
        # than the point-only golden (deep BN chains amplify f32 rounding)
        if delta > 2e-2:
            bad.append((path, delta))
    assert not bad, f"gradient drift: {sorted(bad, key=lambda x: -x[1])[:8]}"


def test_bn_stats_update_matches_reference(env):
    _, _, _, data, _, _, new_bs = env
    want = _flat(_tree_from(data, "newstats//"))
    got = _flat(jax.device_get(new_bs))
    for k in want:
        a, b = np.asarray(want[k]), np.asarray(got[k])
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=1e-5, err_msg="/".join(k)
        )


def test_adamw_update_matches_reference(env):
    """One optimizer step through OUR builder: frozen mask BEFORE the clip
    (reference excludes requires_grad=False params from clip_grad_norm_ and
    from the optimizer entirely) + decay masking + torch clip semantics.

    Driven from the FROZEN fp64 gradients (optimizer semantics only —
    gradient correctness is test_gradients' job)."""
    import optax

    from imgadapointr_tpu.tools.builder import build_opt_sched

    config, spec, params, data, _, _, _ = env
    grads = jax.tree.map(
        lambda x: x.astype(jnp.float32), _tree_from(data, "grad//")
    )
    tx, _, _ = build_opt_sched(
        config, 1, params, frozen_paths=tuple(spec.frozen_paths)
    )
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
        if any(m in path for m in ZERO_GRAD + FROZEN):
            # reference: skipped by add_weight_decay / grad=None → no update;
            # ours: optax frozen mask / zero grads → must be exactly zero
            assert np.abs(b).max() == 0.0, f"{path} must get zero update"
            continue
        if np.abs(a).max() < 1e-3 * u_global:
            continue  # noise-grad updates, immaterial (see harness)
        scale = max(np.abs(a).max(), 1e-4 * u_global)
        delta = np.abs(a - b).max() / scale
        if delta > 5e-3:
            bad.append((path, delta))
    assert not bad, f"adamw update drift: {sorted(bad, key=lambda x: -x[1])[:8]}"
