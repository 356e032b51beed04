"""Round-5 regression tests.

1. The SGCAM product reassociation (models/gdanet.py ``commute=True``)
   matches the reference-order dense form to f32-rounding tolerance, and
   its TPU/train gate stays OFF in this CPU suite.
2. ``nn.remat`` over the frozen-GDANet flow-through (models/seg_adapointr.
   _make_seg_fn) is bit-exact: values AND gradients identical with the
   rematerialisation disabled via IMGADAPOINTR_DISABLE_SEG_REMAT.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.models.build import build_model_spec
from imgadapointr_tpu.models.gdanet import SGCAM
from imgadapointr_tpu.models.seg_adapointr import _sgcam_commute_active
from imgadapointr_tpu.utils.config import AttrDict

from test_img_seg_models import TINY_CORE, _batch


def test_sgcam_commute_matches_dense():
    m = SGCAM(64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 96, 64))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 64))
    variables = m.init(jax.random.PRNGKey(2), x, x2)
    # zero-init output BN scale makes the module identity; randomise the
    # params so the attention path actually contributes
    variables = jax.tree.map(
        lambda p: p + jax.random.normal(jax.random.PRNGKey(3), p.shape) * 0.1,
        variables,
    )
    dense_y = m.apply(variables, x, x2, commute=False)
    fast_y = m.apply(variables, x, x2, commute=True)
    np.testing.assert_allclose(
        np.asarray(dense_y), np.asarray(fast_y), rtol=2e-5, atol=2e-5
    )


def test_sgcam_commute_gate_off_on_cpu():
    # the reassociation is TPU-train-only; this suite runs on CPU where the
    # reference-exact order must be used (grad-parity goldens depend on it)
    if jax.default_backend() != "tpu":
        assert not _sgcam_commute_active(True)
    assert not _sgcam_commute_active(False)


def _seg_train_grads(monkeypatch, disable_remat):
    # remat is opt-IN (measured slower on the gather-bound GDANet subgraph;
    # kept as a memory lever) — the test still proves its math
    if disable_remat:
        monkeypatch.delenv("IMGADAPOINTR_ENABLE_SEG_REMAT", raising=False)
    else:
        monkeypatch.setenv("IMGADAPOINTR_ENABLE_SEG_REMAT", "1")
    cfg = AttrDict(dict(TINY_CORE, NAME="SegEncAdaPoinTr"))
    spec = build_model_spec(cfg)
    batch = _batch(with_cls=True)
    key = jax.random.PRNGKey(0)
    inputs = [batch[k] for k in spec.inputs]
    variables = jax.jit(
        lambda k, *i: spec.module.init(
            {"params": k, "noise": k, "dropout": k}, *i, train=True
        )
    )(key, *inputs)

    def loss(p):
        ret, _ = spec.module.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            *inputs,
            train=True,
            rngs={"noise": key, "dropout": key},
            mutable=["batch_stats"],
        )
        sparse, dense = spec.loss_fn(ret, batch["gt"], 0)
        return sparse + dense

    val, grads = jax.jit(jax.value_and_grad(loss))(variables["params"])
    return float(val), jax.device_get(grads)


def test_seg_remat_value_exact_grads_ulp(monkeypatch):
    """Rematerialising the frozen-GDANet flow-through replays the identical
    deterministic forward: the loss value is bit-equal. Gradients agree to
    f32 rounding only — XLA fuses the remat backward differently, so
    ulp-level reassociation remains (measured ~1e-6 relative on CPU)."""
    v_remat, g_remat = _seg_train_grads(monkeypatch, disable_remat=False)
    v_plain, g_plain = _seg_train_grads(monkeypatch, disable_remat=True)
    assert v_remat == v_plain
    flat_r = jax.tree_util.tree_leaves_with_path(g_remat)
    flat_p = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_plain)
    )
    assert flat_r and len(flat_r) == len(flat_p)
    for k, v in flat_r:
        ks = jax.tree_util.keystr(k)
        ref = np.asarray(flat_p[ks])
        scale = float(np.abs(ref).max()) if ref.size else 0.0
        np.testing.assert_allclose(
            np.asarray(v), ref, rtol=2e-4, atol=scale * 2e-4 + 1e-30,
            err_msg=ks,
        )


# --------------------------------------------------------------- checkpoints
def _small_state(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "params": {"w": jax.random.normal(k, (8, 4)), "b": jnp.zeros((4,))},
        "batch_stats": {"mean": jnp.ones((4,)) * seed},
        "opt_state": {"mu": jnp.zeros((8, 4))},
        "step": jnp.asarray(seed, jnp.int32),
    }


def test_checkpoint_save_atomic_kill_before_commit(tmp_path, monkeypatch):
    """A kill at ANY point during save must leave the previous complete
    checkpoint loadable. Simulated at the worst spot: after the temp file
    is fully written, just before os.replace commits it."""
    from imgadapointr_tpu.utils import checkpoint as ckpt

    exp = str(tmp_path)
    s1, s2 = _small_state(1), _small_state(2)
    ckpt.save_checkpoint(s1, None, None, 1, "ckpt-last", exp)

    real_replace = os.replace

    def killed_replace(src, dst):
        raise RuntimeError("simulated SIGKILL mid-save")

    monkeypatch.setattr(ckpt.os, "replace", killed_replace)
    with pytest.raises(RuntimeError):
        ckpt.save_checkpoint(s2, None, None, 2, "ckpt-last", exp)
    monkeypatch.setattr(ckpt.os, "replace", real_replace)

    restored, meta = ckpt.load_checkpoint(_small_state(0), "ckpt-last", exp)
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(s1["params"]["w"])
    )


def test_checkpoint_kill_during_payload_write_leaves_old_intact(
    tmp_path, monkeypatch
):
    """Kill mid-WRITE (truncated temp file): the live files never see a
    partial byte stream; resume loads the old state."""
    from imgadapointr_tpu.utils import checkpoint as ckpt

    exp = str(tmp_path)
    s1 = _small_state(1)
    ckpt.save_checkpoint(s1, None, None, 7, "ckpt-last", exp)

    def truncating_write(path, data):
        with open(path + ".tmp", "wb") as f:
            f.write(data[: len(data) // 3])
        raise RuntimeError("simulated SIGKILL mid-write")

    monkeypatch.setattr(ckpt, "_atomic_write", truncating_write)
    with pytest.raises(RuntimeError):
        ckpt.save_checkpoint(_small_state(9), None, None, 9, "ckpt-last", exp)
    monkeypatch.undo()

    restored, meta = ckpt.load_checkpoint(_small_state(0), "ckpt-last", exp)
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(s1["params"]["w"])
    )


def test_checkpoint_kill_between_payload_and_meta(tmp_path, monkeypatch):
    """Payload commits before meta (documented ordering): a kill in between
    resumes with NEW weights at the OLD epoch — conservative, never
    corrupt."""
    from imgadapointr_tpu.utils import checkpoint as ckpt

    exp = str(tmp_path)
    s1, s2 = _small_state(1), _small_state(2)
    ckpt.save_checkpoint(s1, None, None, 1, "ckpt-last", exp)

    real_write = ckpt._atomic_write

    def meta_killed(path, data):
        if path.endswith(".json"):
            raise RuntimeError("simulated SIGKILL before meta commit")
        real_write(path, data)

    monkeypatch.setattr(ckpt, "_atomic_write", meta_killed)
    with pytest.raises(RuntimeError):
        ckpt.save_checkpoint(s2, None, None, 2, "ckpt-last", exp)
    monkeypatch.undo()

    restored, meta = ckpt.load_checkpoint(_small_state(0), "ckpt-last", exp)
    assert meta["epoch"] == 1  # old meta
    np.testing.assert_array_equal(  # new payload
        np.asarray(restored["params"]["w"]), np.asarray(s2["params"]["w"])
    )


# -------------------------------------------------------------- start_ckpts
def test_load_weights_only_ignores_optimizer(tmp_path):
    """Reference --start_ckpts semantics (tools/builder.py:141-157): params
    + batch stats come from the donor file; optimizer/step stay fresh."""
    from imgadapointr_tpu.utils import checkpoint as ckpt

    donor = _small_state(5)
    donor["opt_state"] = {"mu": jnp.ones((8, 4)) * 99.0}
    ckpt.save_checkpoint(donor, None, None, 5, "donor", str(tmp_path))

    template = _small_state(0)
    out = ckpt.load_weights_only(template, str(tmp_path / "donor.ckpt"))
    np.testing.assert_array_equal(
        np.asarray(out["params"]["w"]), np.asarray(donor["params"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["batch_stats"]["mean"]),
        np.asarray(donor["batch_stats"]["mean"]),
    )
    # optimizer state and step are the TEMPLATE's (fresh), not the donor's
    np.testing.assert_array_equal(
        np.asarray(out["opt_state"]["mu"]), np.asarray(template["opt_state"]["mu"])
    )
    assert int(out["step"]) == 0


def test_start_ckpts_routes_torch_pth(tmp_path, monkeypatch):
    """A .pth path routes through the torch converter (reference warm-start
    from pretrained/*.pth, e.g. the KITTI-cars finetune config)."""
    import types

    from imgadapointr_tpu.tools import runner as runner_mod

    calls = {}

    def fake_loader(weights, path, model_cfg):
        calls["path"] = path
        calls["name"] = model_cfg.NAME
        return {"params": {"w": jnp.ones((2,))}, "batch_stats": {}}

    import imgadapointr_tpu.tools.convert_torch as ct

    monkeypatch.setattr(ct, "load_torch_checkpoint_into_state", fake_loader)
    args = types.SimpleNamespace(experiment_path=str(tmp_path))
    config = types.SimpleNamespace(model=types.SimpleNamespace(NAME="AdaPoinTr"))
    state = {
        "params": {"w": jnp.zeros((2,))},
        "batch_stats": {},
        "opt_state": {},
        "step": jnp.asarray(3, jnp.int32),
    }
    out = runner_mod._load_start_ckpts(state, "pretrained/x.pth", args, config, None)
    assert calls == {"path": "pretrained/x.pth", "name": "AdaPoinTr"}
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), np.ones((2,)))
    assert int(out["step"]) == 3  # untouched by the weights-only load


def _tiny_synth_cfg(max_epoch):
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    import importlib.util
    import pathlib

    main_path = pathlib.Path(__file__).resolve().parents[1] / "main.py"
    mspec = importlib.util.spec_from_file_location("_repo_main5", main_path)
    main_mod = importlib.util.module_from_spec(mspec)
    mspec.loader.exec_module(main_mod)

    cfg = cfg_from_yaml_file("cfgs/PCN_models/AdaPoinTr-tiny.yaml")
    main_mod._swap_synthetic(cfg, train_len=8)
    # batch must divide the 8-virtual-device data axis (strict train
    # sharding, parallel/mesh.shard_batch)
    cfg.total_bs = 8
    cfg.max_epoch = max_epoch
    cfg.dataset.train.others.bs = 8
    cfg.dataset.val.others.bs = 1
    return cfg


def _mk_args(exp, start_ckpts=None, resume=False):
    import types

    os.makedirs(exp, exist_ok=True)
    return types.SimpleNamespace(
        experiment_path=exp, seed=0, num_workers=2, tp=1, gdanet_w=None,
        val_freq=1, resume=resume, start_ckpts=start_ckpts, ckpts=None,
        emd=False, wandb=False, profile=False,
    )


def test_start_ckpts_warm_start_e2e(tmp_path):
    """main.py-style warm start: train 1 tiny epoch, then start a fresh run
    with --start_ckpts pointing at the produced arbitrary-path checkpoint;
    the new run's initial params must equal the donor's weights."""
    from imgadapointr_tpu.tools.runner import run_net

    mk_cfg, mk_args = _tiny_synth_cfg, _mk_args
    exp1 = str(tmp_path / "donor")
    state1 = run_net(mk_args(exp1), mk_cfg(1), writers=None)
    donor_path = os.path.join(exp1, "ckpt-last.ckpt")
    assert os.path.exists(donor_path)

    # max_epoch=0: run_net returns the warm-started state untouched
    exp2 = str(tmp_path / "warm")
    state2 = run_net(
        mk_args(exp2, start_ckpts=donor_path), mk_cfg(0), writers=None
    )
    w1 = jax.tree.leaves(jax.device_get(state1["params"]))
    w2 = jax.tree.leaves(jax.device_get(state2["params"]))
    assert len(w1) == len(w2)
    for a, b in zip(w1, w2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # fresh optimizer: step counter back at zero
    assert int(state2["step"]) == 0


def test_rss_watchdog_self_preempts_and_resumes(tmp_path, monkeypatch):
    """The RSS watchdog converts the remote-tunnel host leak into a clean
    self-preemption: ckpt-last saved, exit code 75, and a --resume relaunch
    (scripts/train_loop.sh's contract) finishes the run."""
    from imgadapointr_tpu.tools import runner as runner_mod
    from imgadapointr_tpu.utils.checkpoint import load_checkpoint

    exp = str(tmp_path / "wd")
    monkeypatch.setenv("IMGADAPOINTR_RSS_LIMIT_GB", "1")
    monkeypatch.setattr(runner_mod, "_host_rss_gb", lambda: 999.0)
    with pytest.raises(SystemExit) as exc:
        runner_mod.run_net(_mk_args(exp), _tiny_synth_cfg(2), writers=None)
    assert exc.value.code == runner_mod.RSS_RESTART_EXIT_CODE == 75
    # checkpoint written BEFORE the self-preemption, loadable
    assert os.path.exists(os.path.join(exp, "ckpt-last.ckpt"))

    # supervisor relaunch: --resume with the watchdog disabled finishes
    monkeypatch.setenv("IMGADAPOINTR_RSS_LIMIT_GB", "0")
    state = runner_mod.run_net(
        _mk_args(exp, resume=True), _tiny_synth_cfg(2), writers=None
    )
    _, meta = load_checkpoint(
        {"params": state["params"], "batch_stats": state["batch_stats"],
         "opt_state": state["opt_state"], "step": state["step"]},
        "ckpt-last", exp,
    )
    assert int(meta["epoch"]) == 1  # final epoch of the 2-epoch run


def test_rss_watchdog_not_tripped_on_final_epoch(tmp_path, monkeypatch):
    """A run on its LAST epoch completes instead of self-preempting (no
    point restarting a finished run)."""
    from imgadapointr_tpu.tools import runner as runner_mod

    exp = str(tmp_path / "wd2")
    monkeypatch.setenv("IMGADAPOINTR_RSS_LIMIT_GB", "1")
    monkeypatch.setattr(runner_mod, "_host_rss_gb", lambda: 999.0)
    state = runner_mod.run_net(_mk_args(exp), _tiny_synth_cfg(1), writers=None)
    assert state is not None


def test_save_freq_throttles_checkpoint_cadence(tmp_path):
    """--save_freq N writes ckpt-last only on multiples of N (plus the
    final two epochs) — the mitigation for the measured ~60s/epoch
    full-state fetch over a remote-TPU tunnel. Default 1 = reference
    every-epoch parity."""
    from imgadapointr_tpu.tools.runner import run_net
    from imgadapointr_tpu.utils.checkpoint import load_checkpoint

    exp = str(tmp_path / "sf")
    args = _mk_args(exp)
    args.save_freq = 3
    args.val_freq = 10  # no best-saves interfering
    state = run_net(args, _tiny_synth_cfg(5), writers=None)
    assert state is not None
    # epochs 0..4: saves at 0, 3 (multiples) and 3, 4 (final two) — the
    # last write is epoch 4
    _, meta = load_checkpoint(
        {"params": state["params"], "batch_stats": state["batch_stats"],
         "opt_state": state["opt_state"], "step": state["step"]},
        "ckpt-last", exp,
    )
    assert int(meta["epoch"]) == 4
    assert os.path.exists(os.path.join(exp, "ckpt-epoch-004.ckpt"))
