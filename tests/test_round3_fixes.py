"""Round-3 fixes: ignore_zeros metric parity, per-sample F-score, strict
train-batch sharding, declarative train_aug selection, gridding_loss span."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.ops.gridding import gridding_loss
from imgadapointr_tpu.parallel.mesh import make_mesh, shard_batch
from imgadapointr_tpu.utils.config import AttrDict
from imgadapointr_tpu.utils.metrics import compute_metrics, f_score


def _brute_cd(pred, gt):
    """Reference chamfer on already-stripped clouds: L1 = (mean sqrt d1 +
    mean sqrt d2)/2, L2 = mean d1 + mean d2 (extensions/chamfer_dist)."""
    d = np.sum((pred[:, None] - gt[None]) ** 2, axis=-1)
    d1, d2 = d.min(1), d.min(0)
    l1 = (np.mean(np.sqrt(d1)) + np.mean(np.sqrt(d2))) / 2
    l2 = np.mean(d1) + np.mean(d2)
    return l1, l2


def test_ignore_zeros_golden_bs1():
    """Zero-padded bs=1 batch: compute_metrics(ignore_zeros=True) must match
    the reference ChamferDistance*(ignore_zeros=True) value — i.e. the CD of
    the stripped clouds (reference extensions/chamfer_dist/__init__.py:37-41,
    utils/metrics.py:26,33)."""
    rng = np.random.RandomState(0)
    pred_real = rng.randn(100, 3).astype(np.float32) * 0.3
    gt_real = rng.randn(140, 3).astype(np.float32) * 0.3
    pred = np.zeros((1, 128, 3), np.float32)
    gt = np.zeros((1, 160, 3), np.float32)
    pred[0, :100] = pred_real
    gt[0, :140] = gt_real

    want_l1, want_l2 = _brute_cd(pred_real, gt_real)
    _, cdl1, cdl2, _ = compute_metrics(
        jnp.asarray(pred), jnp.asarray(gt), ignore_zeros=True
    )
    np.testing.assert_allclose(float(cdl1), want_l1 * 1000, rtol=1e-5)
    np.testing.assert_allclose(float(cdl2), want_l2 * 1000, rtol=1e-5)

    # without the flag the padded origin points poison the means (this is
    # exactly the silent divergence the flag exists to prevent)
    _, raw_l1, _, _ = compute_metrics(jnp.asarray(pred), jnp.asarray(gt))
    assert abs(float(raw_l1) - want_l1 * 1000) > 1e-3


def test_ignore_zeros_noop_on_dense_clouds():
    """PCN-style fully dense clouds: the flag must change nothing."""
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    gt = jnp.asarray(rng.randn(1, 96, 3).astype(np.float32))
    a = compute_metrics(pred, gt)
    b = compute_metrics(pred, gt, ignore_zeros=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(float(x), float(y), rtol=1e-6)


def test_f_score_per_sample_and_masked():
    rng = np.random.RandomState(2)
    pred = jnp.asarray(rng.randn(3, 64, 3).astype(np.float32) * 0.1)
    gt = jnp.asarray(rng.randn(3, 64, 3).astype(np.float32) * 0.1)
    per = f_score(pred, gt, reduce=False)
    assert per.shape == (3,)
    np.testing.assert_allclose(float(jnp.mean(per)), float(f_score(pred, gt)), rtol=1e-6)

    # masked: zero-padding a cloud and masking it must equal the unpadded F
    base = float(f_score(pred[:1], gt[:1]))
    pred_pad = jnp.concatenate([pred[:1], jnp.zeros((1, 32, 3))], axis=1)
    w = jnp.concatenate([jnp.ones((1, 64)), jnp.zeros((1, 32))], axis=1)
    masked = float(f_score(pred_pad, gt[:1], w_pred=w))
    np.testing.assert_allclose(masked, base, rtol=1e-6)
    # unmasked padded F differs (padded origin points count as hits/misses)
    assert abs(float(f_score(pred_pad, gt[:1])) - base) > 1e-6


def test_shard_batch_strict_rejects_indivisible():
    mesh = make_mesh()  # 8 virtual CPU devices
    bad = {"partial": np.zeros((3, 8, 3), np.float32)}
    with pytest.raises(ValueError, match="does not divide"):
        shard_batch(bad, mesh, strict=True)
    # non-strict (eval) path still replicates bs=1 silently
    out = shard_batch({"partial": np.zeros((1, 8, 3), np.float32)}, mesh)
    assert out["partial"].shape == (1, 8, 3)
    # divisible batches pass strict
    ok = shard_batch({"partial": np.zeros((8, 4, 3), np.float32)}, mesh, strict=True)
    assert ok["partial"].shape == (8, 4, 3)


def _runner_with_train_cfg(train_cfg):
    from imgadapointr_tpu.tools.runner import Runner

    config = AttrDict(
        {
            "dataset": {"train": train_cfg},
            "model": {
                "NAME": "FoldingNet", "num_pred": 64, "encoder_channel": 32,
            },
        }
    )
    return Runner(types.SimpleNamespace(tp=1), config)


def test_train_aug_explicit_overrides_name():
    # ShapeNet-named dataset, but config says none → no crop branch
    r = _runner_with_train_cfg(
        {"train_aug": "none", "NAME": "ShapeNet55", "N_POINTS": 8192}
    )
    assert not r.shapenet_train_crop and not r.cars_dropping

    # PCN-named dataset with explicit crop → crop branch on
    r = _runner_with_train_cfg(
        {"train_aug": "crop", "NAME": "PCN", "N_POINTS": 8192}
    )
    assert r.shapenet_train_crop


def test_train_aug_explicit_null_means_off():
    """A bare `train_aug:` line (YAML null) is an explicit OFF — it must NOT
    fall through to NAME inference, which would silently re-enable crop on a
    ShapeNet-named dataset."""
    r = _runner_with_train_cfg(
        {"train_aug": None, "NAME": "ShapeNet55", "N_POINTS": 8192}
    )
    assert r.train_aug == "none"
    assert not r.shapenet_train_crop and not r.cars_dropping


def test_train_aug_inferred_back_compat():
    r = _runner_with_train_cfg({"NAME": "ShapeNet55", "N_POINTS": 8192})
    assert r.shapenet_train_crop  # inferred, reference behaviour
    r = _runner_with_train_cfg({"NAME": "PCN", "CARS": True, "N_POINTS": 8192})
    assert r.cars_dropping
    r = _runner_with_train_cfg({"NAME": "PCN", "N_POINTS": 8192})
    assert r.train_aug == "none"
    with pytest.raises(ValueError, match="train_aug"):
        _runner_with_train_cfg({"train_aug": "bogus", "NAME": "PCN"})


def test_eval_metric_suite_matches_separate_metrics():
    """The shared-pass eval suite must reproduce f_score/chamfer_l1/
    chamfer_l2 exactly (on CPU both run the exact selection path)."""
    from imgadapointr_tpu.ops import chamfer_l1, chamfer_l2
    from imgadapointr_tpu.utils.metrics import eval_metric_suite

    rng = np.random.RandomState(4)
    pred = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    gt = jnp.asarray(rng.randn(2, 160, 3).astype(np.float32) * 0.2)
    f, l1, l2 = eval_metric_suite(pred, gt)
    np.testing.assert_allclose(float(f), float(f_score(pred, gt)), rtol=1e-6)
    np.testing.assert_allclose(float(l1), float(chamfer_l1(pred, gt)) * 1000, rtol=1e-6)
    np.testing.assert_allclose(float(l2), float(chamfer_l2(pred, gt)) * 1000, rtol=1e-6)


def test_train_loss_path_never_uses_eval_chamfer(monkeypatch):
    """The MXU eval selection kernel must be unreachable from the training
    loss: poison nn_distance_eval and take a full loss+grad — must pass."""
    import imgadapointr_tpu.ops as ops_pkg
    import imgadapointr_tpu.ops.chamfer as chamfer_mod
    from imgadapointr_tpu.models.build import build_model_spec

    def boom(*a, **k):
        raise AssertionError("nn_distance_eval reached from the train path")

    monkeypatch.setattr(chamfer_mod, "nn_distance_eval", boom)
    monkeypatch.setattr(ops_pkg, "nn_distance_eval", boom)

    cfg = AttrDict(
        {
            "NAME": "AdaPoinTr", "num_query": 16, "num_points": 64,
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
    spec = build_model_spec(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 128, 3))
    gt = jax.random.normal(key, (2, 64, 3))
    variables = spec.module.init(
        {"params": key, "noise": key, "dropout": key}, x, train=True
    )

    def loss(params):
        ret, _ = spec.module.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            x, train=True, rngs={"noise": key, "dropout": key},
            mutable=["batch_stats"],
        )
        s, d = spec.loss_fn(ret, gt, jnp.asarray(0.0))
        return s + d

    g = jax.grad(loss)(variables["params"])
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_gridding_loss_span_invariance():
    """For clouds that fit both buffers, a larger span must not change the
    loss (the mean uses the dynamic element count, not the buffer size) —
    and span must be plumbed through gridding_loss (ADVICE round 2)."""
    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 64, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 64, 3)).astype(np.float32))
    a = float(gridding_loss(pred, gt, [16], [1.0]))
    b = float(gridding_loss(pred, gt, [16], [1.0], span=4.0))
    np.testing.assert_allclose(a, b, rtol=1e-6)

    # clouds escaping [-1,1]: default span truncates (flagged via
    # jax.debug.print), a big-enough span recovers the exact loss
    pred2, gt2 = pred * 1.8, gt * 1.8
    big = float(gridding_loss(pred2, gt2, [16], [1.0], span=8.0))
    bigger = float(gridding_loss(pred2, gt2, [16], [1.0], span=12.0))
    np.testing.assert_allclose(big, bigger, rtol=1e-6)


def test_frozen_grads_excluded_from_clip_norm():
    """Frozen-subtree grads must be zeroed BEFORE the global-norm clip: the
    reference freezes via requires_grad=False (runner.py:55-66), so torch's
    clip_grad_norm_ never sees those grads — leaving our (computed-then-
    masked) frozen grads inside the norm would rescale every clipped update
    (tools/builder.py)."""
    from imgadapointr_tpu.tools.builder import build_opt_sched

    cfg = AttrDict(
        {
            # SGD: the update is PROPORTIONAL to the clipped grads (first-step
            # Adam normalizes to ±lr and would hide the clip coefficient)
            "optimizer": {"type": "SGD", "kwargs": {"lr": 1e-2, "weight_decay": 0.0,
                                                    "momentum": 0.0}},
            "scheduler": {"type": "StepLR", "kwargs": {"decay_step": 10, "gamma": 1.0}},
            "max_epoch": 10,
            "grad_norm_clip": 10.0,
        }
    )
    params = {
        "net": {"w": jnp.zeros((4, 4))},
        "segmentator": {"w": jnp.zeros((4, 4))},
    }
    grads = {
        "net": {"w": jnp.full((4, 4), 10.0)},  # norm 40 → clip engages
        "segmentator": {"w": jnp.full((4, 4), 1000.0)},  # must NOT inflate it
    }

    def one_update(frozen):
        tx, _, _ = build_opt_sched(cfg, 1, params, frozen_paths=frozen)
        upd, _ = tx.update(grads, tx.init(params), params)
        return upd

    upd_frozen = one_update(("segmentator",))
    # frozen subtree: exactly zero update
    assert float(jnp.abs(upd_frozen["segmentator"]["w"]).max()) == 0.0
    # live subtree: clip coefficient computed WITHOUT the frozen grads —
    # identical to a model where the frozen grads are zero to begin with
    grads_ref = {"net": grads["net"], "segmentator": {"w": jnp.zeros((4, 4))}}
    tx, _, _ = build_opt_sched(cfg, 1, params, frozen_paths=())
    upd_ref, _ = tx.update(grads_ref, tx.init(params), params)
    np.testing.assert_allclose(
        np.asarray(upd_frozen["net"]["w"]), np.asarray(upd_ref["net"]["w"]),
        rtol=1e-6,
    )
    # and demonstrably different from clipping WITH the frozen grads in the
    # norm (guards against regressing the mask back behind the clip)
    upd_naive, _ = tx.update(grads, tx.init(params), params)
    assert not np.allclose(
        np.asarray(upd_frozen["net"]["w"]), np.asarray(upd_naive["net"]["w"])
    )


def test_gdm_local_adjacency_bit_exact():
    """gdm()'s gather-free local adjacency (top-k values + row colsum) must be
    BIT-identical to the reference's dense form A = w/colsum followed by
    take_along_axis at the neighbour columns (models/gdanet.py; the dense
    form costs 13 ms of HBM gathers per superset train step)."""
    from imgadapointr_tpu.models.gdanet import _knn_desc, gdm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 96, 64)).astype(np.float32))
    k, tau, sigma = 64, 0.2, 2.0

    def gdm_dense(x, M, k, tau, sigma):
        k = min(k, x.shape[1])
        idx, p, _ = _knn_desc(x, k)
        mask = jnp.sqrt(jnp.abs(p)) < tau
        w = jnp.exp(p / (sigma * sigma)) * mask.astype(x.dtype)
        colsum = jnp.sum(w, axis=1)
        A = w / jnp.maximum(colsum, 1e-12)[:, :, None]
        nbr_idx = idx[:, :, 1:]
        A_local = jnp.take_along_axis(A, nbr_idx, axis=2)
        from imgadapointr_tpu.ops import index_points

        nbr = index_points(x, nbr_idx)
        n = jnp.sum(A_local[..., None] * nbr, axis=2)
        pai = jnp.sum((x - n) ** 2, axis=-1)
        _, sharp = jax.lax.top_k(pai, M)
        _, gentle = jax.lax.top_k(-pai, M)
        return index_points(x, sharp), index_points(x, gentle)

    # tau small → most pairs masked; also probe a tau where the mask is live
    for tau_probe in (0.2, 5.0):
        got = jax.jit(lambda x: gdm(x, M=48, k=k, tau=tau_probe, sigma=sigma))(x)
        want = jax.jit(
            lambda x: gdm_dense(x, 48, k, tau_probe, sigma)
        )(x)
        for g, w_ in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w_)), tau_probe


def test_gdanet_edge_conv_commuted_equivalence():
    """The commuted edge conv (gather AFTER the dense, models/gdanet.py
    _edge_conv_commuted) must equal the reference cat-form
    dense(local_operator(x)) up to f32 reassociation."""
    from flax import linen as nn

    from imgadapointr_tpu.models import gdanet as gmod

    class Probe(nn.Module):
        ch: int = 64

        @nn.compact
        def __call__(self, x, commuted: bool):
            if commuted:
                return gmod.GDANet._edge_conv_commuted(self, x, 30, self.ch, "conv2")
            feat = gmod.local_operator(x, min(30, x.shape[1]))
            return gmod.GDANet._conv_bn(self, feat, self.ch, "conv2")

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 67)).astype(np.float32))
    probe = Probe()
    variables = probe.init(jax.random.PRNGKey(0), x, False)
    # give BN non-trivial stats and the kernel non-default values
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables,
    )
    ref = probe.apply(variables, x, False)
    got = probe.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-6)


def test_weighted_gather_sum_pallas_interpret():
    """Pallas weighted-gather-sum (ops/pallas/gather_sum.py): forward AND
    both gradients must match the XLA gather+reduce chain (interpret mode —
    the TPU dispatch in models/gdanet._aggregate_neighbours is size-gated)."""
    from imgadapointr_tpu.ops import index_points
    from imgadapointr_tpu.ops.pallas.gather_sum import weighted_gather_sum_pallas

    rng = np.random.default_rng(3)
    B, S, K, M, C = 2, 40, 7, 50, 12
    w = jnp.asarray(rng.normal(size=(B, S, K)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (B, S, K)).astype(np.int32))
    f = jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32))

    def ref(w, f):
        return jnp.sum(w[..., None] * index_points(f, idx), axis=2)

    def ker(w, f):
        return weighted_gather_sum_pallas(w, idx, f, True)

    out_r = ref(w, f)
    out_k = ker(w, f)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), rtol=2e-5, atol=1e-6)

    g = jnp.asarray(rng.normal(size=out_r.shape).astype(np.float32))
    dwr, dfr = jax.grad(lambda w, f: jnp.sum(ref(w, f) * g), argnums=(0, 1))(w, f)
    dwk, dfk = jax.grad(lambda w, f: jnp.sum(ker(w, f) * g), argnums=(0, 1))(w, f)
    np.testing.assert_allclose(np.asarray(dwk), np.asarray(dwr), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dfk), np.asarray(dfr), rtol=2e-5, atol=1e-6)


def test_dynamic_graph_attention_commuted_equivalence():
    """DynamicGraphAttention's commuted edge conv (gather AFTER the dense,
    nn/local_attention.py) must equal the reference cat-form
    dense(cat(nbr−q, q)) up to f32 reassociation — normal, cross (v given),
    and denoise two-phase paths."""
    from flax import linen as nn

    from imgadapointr_tpu.nn import local_attention as la
    from imgadapointr_tpu.nn.layers import dense
    from imgadapointr_tpu.ops import index_points, knn_point

    C, k = 32, 6

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, q, q_pos, v=None, v_pos=None, denoise_length=0):
            if denoise_length == 0:
                v = q if v is None else v
                v_pos = q_pos if v_pos is None else v_pos
                idx = knn_point(k, v_pos, q_pos)
                local_v = index_points(v, idx)
            else:
                (local_v,) = la._two_phase_knn_gather(
                    k, q_pos, q_pos, (q,), denoise_length
                )
            qk = jnp.broadcast_to(q[:, :, None], local_v.shape)
            feature = jnp.concatenate([local_v - qk, qk], axis=-1)
            return jnp.max(la.leaky_relu(dense(C, name="knn_map")(feature)), axis=2)

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 48, C)).astype(np.float32))
    qp = jnp.asarray(rng.normal(size=(2, 48, 3)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 24, C)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(2, 24, 3)).astype(np.float32))

    new = la.DynamicGraphAttention(C, k)
    variables = new.init(jax.random.PRNGKey(0), q, qp)
    ref = Ref()
    for kwargs in (
        {},
        {"v": v, "v_pos": vp},
        {"denoise_length": 8},
    ):
        a = ref.apply(variables, q, qp, **kwargs)
        b = new.apply(variables, q, qp, **kwargs)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6,
            err_msg=str(kwargs),
        )


def test_knn_diff_form_fallback_is_elementwise():
    """knn_with_distance(diff_form=True) must rank by cancellation-free
    elementwise Σ(q−x)² on the XLA fallback — near-duplicate points whose
    matmul-form distance goes (slightly) negative still rank first, so
    ops/sharded.py's per-block selection matches the Pallas diff-form
    kernels at every block size (sharded==unsharded contract on TPU)."""
    from imgadapointr_tpu.ops.pointops import knn_with_distance

    rng = np.random.RandomState(11)
    # large-norm cloud: matmul form |q|²+|x|²−2q·x loses ~2^-25·norm² bits
    base = jnp.asarray(rng.randn(2, 64, 3) * 100.0, jnp.float32)
    q = base + 1e-5  # near-duplicates of every point
    d, i = knn_with_distance(4, base, q, diff_form=True)
    diff = q[:, :, None, :] - base[:, None, :, :]
    want = jnp.sum(diff * diff, axis=-1)
    wd, wi = jax.lax.top_k(-want, 4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(wi))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(-wd))
    assert float(d.min()) >= 0.0  # diff form can never go negative


def test_converter_for_single_source_dispatch():
    """The serving path (main.py --test / demo .pth loading) used to carry
    its own name->converter mapping and silently dropped the image branch of
    ImgEncSegDec checkpoints (with_img defaulted False while the parity
    harnesses passed True). converter_for is now the single source of truth;
    pin its dispatch for every registered NAME."""
    import functools

    from imgadapointr_tpu.tools.convert_torch import (
        convert_adapointr,
        convert_img_adapointr,
        convert_seg_adapointr,
        converter_for,
    )

    c = converter_for("ImgEncSegDecAdaPoinTrVariableLoss")
    assert isinstance(c, functools.partial)
    assert c.func is convert_seg_adapointr
    assert c.keywords == {"with_img": True}  # the dropped-image-branch bug
    assert converter_for("SegEncAdaPoinTr") is convert_seg_adapointr
    assert converter_for("ImgResNetEncAdaPoinTrVariableLoss") is convert_img_adapointr
    for name in ("AdaPoinTr", "AdaPoinTrVariableLoss"):
        assert converter_for(name) is convert_adapointr

    # non-AdaPoinTr families fail loudly at the dispatch boundary instead of
    # crashing deep inside convert_adapointr on AdaPoinTr-only config keys
    import pytest

    for name in ("PCN", "FoldingNet", "GRNet", "SnowFlakeNet", "TopNet"):
        with pytest.raises(ValueError, match="no torch-checkpoint converter"):
            converter_for(name)

    # and the parity harnesses route through the same function
    import parity.run_parity as rp

    assert rp.KIND_TO_NAME["imgsegdec"] == "ImgEncSegDecAdaPoinTrVariableLoss"


def test_gather_rows_beyond_kernel_regimes_falls_back_to_xla():
    """Direct gather_rows_pallas calls with shapes beyond BOTH kernel
    regimes (M > MAX_M_HILO or C > MAX_C_HILO at M > MAX_M) must fall back
    to plain XLA gather instead of launching a Mosaic kernel whose scoped
    VMEM would blow up — public-helper contract, bit-identical values."""
    import numpy as np

    from imgadapointr_tpu.ops.pallas.gather_rows import (
        MAX_C_HILO,
        MAX_M_HILO,
        gather_rows_pallas,
    )

    rng = np.random.RandomState(3)
    for M, C in ((MAX_M_HILO * 2, 3), (MAX_M_HILO, MAX_C_HILO + 8)):
        t = jnp.asarray(rng.randn(1, M, C), jnp.float32)
        i = jnp.asarray(rng.randint(0, M, (1, 256)), jnp.int32)
        out = gather_rows_pallas(t, i)  # must not require a TPU / Mosaic
        want = jnp.take_along_axis(t, i[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_parser_accepts_inert_reference_flags(capsys):
    """A command line copied from the reference workflow (--deterministic,
    --sync_bn, --launcher pytorch --local_rank 0) parses instead of crashing
    argparse, and prints a notice that the flags are inert."""
    from imgadapointr_tpu.utils.parser import get_args

    args = get_args(
        [
            "--config", "cfgs/PCN_models/AdaPoinTr-tiny.yaml",
            "--exp_name", "x",
            "--deterministic", "--sync_bn",
            "--launcher", "pytorch", "--local_rank", "0",
        ]
    )
    assert args.deterministic and args.sync_bn
    out = capsys.readouterr().out
    assert "no effect" in out


def test_syn_train_len_flag_plumbs_to_config():
    """--syn_train_len overrides the synthetic train split length; the env
    fallback and the 64 default stay (back-compat with the recorded harness
    invocations in benchmarks/RESULTS.md)."""
    # Load OUR main.py by path: parity tests put /root/reference on sys.path,
    # so a bare `import main` can resolve to the reference's entry point.
    import importlib.util, pathlib
    main_path = pathlib.Path(__file__).resolve().parents[1] / "main.py"
    spec = importlib.util.spec_from_file_location("_repo_main", main_path)
    main_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(main_mod)
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("cfgs/PCN_models/AdaPoinTr-mid21.yaml")
    main_mod._swap_synthetic(cfg, train_len=2048)
    assert cfg.dataset.train.LENGTH == 2048
    assert cfg.dataset.val.LENGTH == 16  # only the train split scales

    cfg = cfg_from_yaml_file("cfgs/PCN_models/AdaPoinTr-mid21.yaml")
    main_mod._swap_synthetic(cfg)  # default: $SYN_TRAIN_LEN or 64
    import os as _os
    assert cfg.dataset.train.LENGTH == int(_os.environ.get("SYN_TRAIN_LEN", 64))


def test_mxu_eval_optin_disables_f_plumbing(monkeypatch):
    """Under IMGADAPOINTR_ENABLE_MXU_EVAL_CHAMFER the --test steps must NOT
    reuse the eval suite's F (its ~1e-3 selection band can flip F@th hits).
    The guard must mirror the FULL nn_distance_eval gate — env var AND
    backend AND the 2^22-pair size floor — not just the env var: on CPU or
    small clouds the exact path runs regardless, and recomputing F there
    would be a redundant second O(N·M) pass."""
    from imgadapointr_tpu.tools.runner import _mxu_eval_f_banded

    monkeypatch.setenv("IMGADAPOINTR_ENABLE_MXU_EVAL_CHAMFER", "1")
    if jax.default_backend() == "tpu":  # pragma: no cover — CPU CI
        assert _mxu_eval_f_banded(16384, 16384)
        assert not _mxu_eval_f_banded(512, 512)  # below the pair floor
    else:
        # exact path on CPU even with the env set -> F is reusable
        assert not _mxu_eval_f_banded(16384, 16384)
    monkeypatch.delenv("IMGADAPOINTR_ENABLE_MXU_EVAL_CHAMFER", raising=False)
    assert not _mxu_eval_f_banded(16384, 16384)


def test_nonzero_mask_signed_sum_parity():
    """ignore_zeros drops rows by SIGNED sum != 0, exactly like the reference
    (extensions/chamfer_dist/__init__.py:37-41): a real point whose
    coordinates sum to zero is dropped there too (bug-for-bug parity)."""
    from imgadapointr_tpu.utils.metrics import _nonzero_mask

    cloud = jnp.asarray(
        [[[0.3, -0.3, 0.0],   # real point, signed sum == 0 -> DROPPED
          [0.0, 0.0, 0.0],    # padding -> dropped
          [0.1, 0.2, 0.3]]],  # real point -> kept
        dtype=jnp.float32,
    )
    mask = np.asarray(_nonzero_mask(cloud))
    np.testing.assert_array_equal(mask, [[0.0, 0.0, 1.0]])


def test_precomputed_f_plumbing_matches_recompute():
    """compute_metrics(_per_sample) with the eval-suite F passed in must
    equal the self-computed variant bit-for-bit on the default (exact) eval
    path — the runner's --test step relies on this to drop a redundant full
    NN pass per batch."""
    from imgadapointr_tpu.utils.metrics import (
        compute_metrics,
        compute_metrics_per_sample,
        eval_metric_suite,
    )

    rng = np.random.RandomState(7)
    pred = jnp.asarray(rng.randn(3, 96, 3).astype(np.float32) * 0.2)
    gt = jnp.asarray(rng.randn(3, 128, 3).astype(np.float32) * 0.2)

    f_ps, _, _ = eval_metric_suite(pred, gt, reduce=False)
    rows_self = np.asarray(compute_metrics_per_sample(pred, gt))
    rows_plumbed = np.asarray(compute_metrics_per_sample(pred, gt, f_values=f_ps))
    np.testing.assert_array_equal(rows_self, rows_plumbed)

    p1, g1 = pred[:1], gt[:1]
    f_b, _, _ = eval_metric_suite(p1, g1)
    vals_self = [float(v) for v in compute_metrics(p1, g1, ignore_zeros=True)]
    vals_plumbed = [
        float(v)
        for v in compute_metrics(p1, g1, ignore_zeros=True, f_value=f_b)
    ]
    assert vals_self == vals_plumbed


# ---------------------------------------------------------------- loader/IO


class _ExplodingDataset:
    def __len__(self):
        return 8

    def get(self, idx, rng):
        if idx == 5:
            raise OSError("corrupt sample 5")
        return "tax", f"m{idx}", {"gt": np.zeros((4, 3), np.float32)}


def test_loader_surfaces_worker_errors():
    """A decode error must re-raise in the consumer with its ORIGINAL type
    (torch DataLoader ExceptionWrapper semantics — callers can catch e.g.
    OSError for a corrupt shard), not silently truncate the epoch."""
    from imgadapointr_tpu.datasets.loader import DataLoader

    dl = DataLoader(_ExplodingDataset(), batch_size=2, shuffle=False,
                    drop_last=False, num_workers=2)
    with pytest.raises(OSError, match="corrupt sample 5"):
        for _ in dl:
            pass


def test_loader_abandoned_iterator_does_not_deadlock_producer():
    """Breaking out of an epoch mid-iteration must let the producer thread
    exit (it previously blocked forever in q.put on the full prefetch
    queue, leaking the thread + prefetched batches every abandoned epoch)."""
    import threading
    import time as _time

    from imgadapointr_tpu.datasets.loader import DataLoader

    class _Slow:
        def __len__(self):
            return 64

        def get(self, idx, rng):
            return "tax", f"m{idx}", {"gt": np.zeros((256, 3), np.float32)}

    before = {t.ident for t in threading.enumerate()}
    dl = DataLoader(_Slow(), batch_size=4, shuffle=False, drop_last=False,
                    num_workers=2, prefetch=1)
    for i, _ in enumerate(dl):
        if i == 1:
            break  # abandon mid-epoch with the queue full
    deadline = _time.time() + 10.0
    while _time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()
                  and t.name.startswith("Thread-")]
        if not leaked:
            break
        _time.sleep(0.1)
    assert not leaked, f"producer/pool threads leaked: {leaked}"


def test_truncated_pcd_ply_raise_not_hang(tmp_path):
    """EOF before the header terminator must raise, not spin the worker
    thread forever (readline() returns '' at EOF, which the old loop
    treated as a skippable blank line)."""
    from imgadapointr_tpu.utils.io_module import IO

    p = tmp_path / "trunc.pcd"
    p.write_bytes(b"# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\n")  # no DATA
    with pytest.raises(ValueError, match="truncated PCD"):
        IO.get(str(p))

    q = tmp_path / "trunc.ply"
    q.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 3\n")  # no end_header
    with pytest.raises(ValueError, match="truncated PLY"):
        IO.get(str(q))


def test_config_base_deep_merges_nested_dicts(tmp_path):
    """Overriding ONE sub-key of a nested `_base_` dict keeps the base's
    other sub-keys (reference merge_new_config recurses; the old shallow
    merge dropped the whole base dict)."""
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    (tmp_path / "base.yaml").write_text(
        "model:\n  NAME: AdaPoinTr\n  num_query: 512\n  depth: 6\n"
    )
    (tmp_path / "child.yaml").write_text(
        "_base_: base.yaml\nmodel:\n  num_query: 256\n"
    )
    cfg = cfg_from_yaml_file(str(tmp_path / "child.yaml"), root=str(tmp_path))
    assert cfg.model.num_query == 256      # child override wins
    assert cfg.model.NAME == "AdaPoinTr"   # base's other sub-keys survive
    assert cfg.model.depth == 6


def test_load_image_matches_torchvision_resize():
    """_load_image must reproduce the reference's image pipeline pixel-wise:
    torchvision transforms.Resize(224) (BILINEAR, int()-floored long side)
    + ToTensor (reference BasePCNDataset.py:41-44)."""
    tv_mod = pytest.importorskip("torchvision")
    from PIL import Image
    from torchvision import transforms

    if not hasattr(transforms, "Compose"):  # stub install in this image
        pytest.skip("torchvision present but non-functional")

    from imgadapointr_tpu.datasets.pcn_dataset import _load_image

    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (137, 137, 3), dtype=np.uint8)  # ShapeNet render size
    img = Image.fromarray(arr)

    tv = transforms.Compose([transforms.Resize(224), transforms.ToTensor()])
    want = tv(img).permute(1, 2, 0).numpy()  # CHW -> HWC, /255

    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as d:
        path = _os.path.join(d, "render.png")
        img.save(path)
        got = _load_image(path)
    np.testing.assert_allclose(got, want, atol=1e-6)


# ------------------------------------------------------------- optimizer parity


def _sched_cfg(**kw):
    base = {"type": "LambdaLR",
            "kwargs": {"decay_step": 1, "lr_decay": 0.5, "lowest_decay": 1e-6}}
    base.update(kw)
    return base


def test_adam_is_coupled_l2_like_torch():
    """optimizer.type 'Adam' must reproduce torch.optim.Adam: COUPLED L2
    (wd*p added to the grad before the moment updates, 1-D params included)
    — NOT the AdamW decoupled masked decay it previously aliased to."""
    import torch

    from imgadapointr_tpu.tools.builder import build_opt_sched

    cfg = AttrDict({
        "optimizer": {"type": "Adam",
                      "kwargs": {"lr": 1e-2, "weight_decay": 0.1}},
        "scheduler": {"type": "LambdaLR",
                      "kwargs": {"decay_step": 1000, "lr_decay": 1.0,
                                 "lowest_decay": 1.0}},  # constant lr
        "grad_norm_clip": 1e9,  # effectively off
        "max_epoch": 10,
    })
    rng = np.random.RandomState(5)
    w2 = rng.randn(4, 3).astype(np.float32)
    b1 = rng.randn(3).astype(np.float32)  # 1-D: torch Adam decays it too
    params = {"k": jnp.asarray(w2), "b": jnp.asarray(b1)}
    g2 = rng.randn(4, 3).astype(np.float32)
    g1 = rng.randn(3).astype(np.float32)
    grads = {"k": jnp.asarray(g2), "b": jnp.asarray(g1)}

    tx, _, _ = build_opt_sched(cfg, steps_per_epoch=100, params=params)
    import optax
    opt_state = tx.init(params)
    p = params
    for _ in range(3):
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)

    tw = torch.tensor(w2, requires_grad=True)
    tb = torch.tensor(b1, requires_grad=True)
    opt = torch.optim.Adam([tw, tb], lr=1e-2, weight_decay=0.1)
    for _ in range(3):
        tw.grad = torch.tensor(g2)
        tb.grad = torch.tensor(g1)
        opt.step()
    np.testing.assert_allclose(np.asarray(p["k"]), tw.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(p["b"]), tb.detach().numpy(), atol=2e-6)


def test_multisteps_schedule_advances_per_update_not_per_batch():
    """With step_per_update k>1, the LR schedule must advance per OPTIMIZER
    update: k mini-batches = one schedule tick worth k/steps_per_epoch
    epochs. Pre-fix, MultiSteps fed the inner schedule a count of batches/k
    against an unscaled per-epoch divisor, stretching warmup/decay k x."""
    import optax

    from imgadapointr_tpu.tools.builder import build_opt_sched

    base_lr = 1.0
    cfg = AttrDict({
        "optimizer": {"type": "SGD",
                      "kwargs": {"lr": base_lr, "weight_decay": 0.0}},
        "scheduler": _sched_cfg(),  # lr(e) = 0.5^e
        "grad_norm_clip": 1e9,
        "max_epoch": 8,
        "step_per_update": 2,
    })
    params = {"w": jnp.zeros((2,), jnp.float32)}
    grads = {"w": jnp.ones((2,), jnp.float32)}
    tx, lr_step, _ = build_opt_sched(cfg, steps_per_epoch=2, params=params)
    opt_state = tx.init(params)
    p = params
    for _ in range(4):  # 4 mini-batches = 2 optimizer updates = 2 epochs
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
    # update 1 at schedule count 0 (epoch 0, lr 1.0), update 2 at count 1
    # (ONE update per epoch here -> epoch 1, lr 0.5); the k=2 mini-batch
    # grads of ones SUM to 2 per update (reference runner.py:207-215 calls
    # loss.backward() k times and never rescales — torch.optim.SGD then
    # steps on the summed grad, NOT optax.MultiSteps' mean)
    want = -(2.0 * 1.0 + 2.0 * 0.5)
    np.testing.assert_allclose(np.asarray(p["w"]), want, rtol=1e-6)
    # and the logging schedule stays batch-count based: 4 batches = 2 epochs
    np.testing.assert_allclose(float(lr_step(4)), base_lr * 0.25, rtol=1e-6)
