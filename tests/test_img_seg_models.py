"""Tests for the image / segmentation branch models and the normals op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.models.build import build_model_spec
from imgadapointr_tpu.ops.normals import estimate_pointcloud_normals
from imgadapointr_tpu.utils.config import AttrDict

TINY_CORE = {
    "num_query": 16,
    "num_points": 128,
    "center_num": [32, 16],
    "global_feature_dim": 64,
    "encoder_type": "graph",
    "decoder_type": "fc",
    "encoder_config": {
        "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4, "n_group": 2,
        "mlp_ratio": 2.0, "block_style_list": ["attn-graph"],
        "combine_style": "concat",
    },
    "decoder_config": {
        "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4, "n_group": 2,
        "mlp_ratio": 2.0,
        "self_attn_block_style_list": ["attn-graph"],
        "self_attn_combine_style": "concat",
        "cross_attn_block_style_list": ["attn-graph"],
        "cross_attn_combine_style": "concat",
    },
}


def test_normals_on_plane():
    """Points on z=0 plane → normals ±ẑ."""
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.randn(1, 64, 2), np.zeros((1, 64, 1))], axis=-1
    ).astype(np.float32)
    n = np.asarray(estimate_pointcloud_normals(jnp.asarray(pts), 8))
    assert np.abs(np.abs(n[..., 2]) - 1.0).max() < 1e-4
    assert np.abs(n[..., :2]).max() < 1e-3


def _batch(with_img=False, with_cls=False):
    key = jax.random.PRNGKey(0)
    b = {
        "partial": jax.random.normal(key, (2, 128, 3)),
        "gt": jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3)),
    }
    if with_img:
        b["img"] = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    if with_cls:
        cls = np.zeros((2, 16), np.float32)
        cls[:, 3] = 1
        b["cls_vec"] = jnp.asarray(cls)
    return b


def _run_spec(name, extra_inputs):
    cfg = AttrDict(dict(TINY_CORE, NAME=name))
    spec = build_model_spec(cfg)
    batch = _batch("img" in extra_inputs, "cls_vec" in extra_inputs)
    key = jax.random.PRNGKey(0)
    inputs = [batch[k] for k in spec.inputs]
    variables = jax.jit(
        lambda k, *i: spec.module.init({"params": k, "noise": k, "dropout": k}, *i, train=True)
    )(key, *inputs)

    @jax.jit
    def step(v, batch, k):
        inputs = [batch[kk] for kk in spec.inputs]

        def loss(p):
            ret, _ = spec.module.apply(
                {"params": p, "batch_stats": v.get("batch_stats", {})},
                *inputs, train=True, rngs={"noise": k, "dropout": k},
                mutable=["batch_stats"],
            )
            s, d = spec.loss_fn(ret, batch["gt"], 3)
            return s + d

        return jax.value_and_grad(loss)(v["params"])

    l, g = step(variables, batch, jax.random.PRNGKey(3))
    return spec, variables, float(l), g


def test_img_adapointr():
    spec, variables, l, g = _run_spec("ImgResNetEncAdaPoinTrVariableLoss", ("img",))
    assert np.isfinite(l) and l > 0
    # the ResNet image encoder must receive gradients (fusion is on)
    im_grads = [
        v for p, v in jax.tree_util.tree_leaves_with_path(g)
        if "im_encoder" in jax.tree_util.keystr(p)
    ]
    assert im_grads and any(float(jnp.abs(v).max()) > 0 for v in im_grads)


def test_seg_enc_adapointr_frozen_gdanet():
    spec, variables, l, g = _run_spec("SegEncAdaPoinTr", ("cls_vec",))
    assert np.isfinite(l) and l > 0
    assert "segmentator" in spec.frozen_paths
    seg_grads = [
        v for p, v in jax.tree_util.tree_leaves_with_path(g)
        if "segmentator" in jax.tree_util.keystr(p)
    ]
    assert seg_grads  # GDANet params exist in the tree
    # gradients DO flow into GDANet (it's differentiable); freezing happens
    # in the optimizer mask — check the mask machinery instead:
    from imgadapointr_tpu.tools.builder import build_opt_sched
    from imgadapointr_tpu.utils.config import AttrDict as AD

    cfg = AD({
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 1e-2}},
        "scheduler": {"type": "StepLR", "kwargs": {"step_size": 10}},
        "max_epoch": 10,
    })
    tx, _, _ = build_opt_sched(cfg, 10, variables["params"], frozen_paths=("segmentator",))
    opt_state = tx.init(variables["params"])
    updates, _ = tx.update(g, opt_state, variables["params"])
    froz = [
        v for p, v in jax.tree_util.tree_leaves_with_path(updates)
        if "segmentator" in jax.tree_util.keystr(p)
    ]
    live = [
        v for p, v in jax.tree_util.tree_leaves_with_path(updates)
        if "segmentator" not in jax.tree_util.keystr(p)
    ]
    assert all(float(jnp.abs(v).max()) == 0 for v in froz)
    assert any(float(jnp.abs(v).max()) > 0 for v in live)


def test_img_enc_seg_dec():
    spec, variables, l, g = _run_spec(
        "ImgEncSegDecAdaPoinTrVariableLoss", ("img", "cls_vec")
    )
    assert np.isfinite(l) and l > 0
    assert spec.inputs == ("partial", "img", "cls_vec")


def test_variable_alpha_shift():
    """alpha table is shifted by STEP_SIZE (reference :73): epoch 0 ≈ max."""
    from imgadapointr_tpu.models.img_adapointr import variable_alpha

    assert float(variable_alpha(0)) > 0.9
