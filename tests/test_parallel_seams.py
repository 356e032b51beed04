"""Parallel-seam hardening (round-3): uneven host counts in the loader and
data-parallel-width changes across checkpoint resume."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.datasets.loader import DataLoader
from imgadapointr_tpu.parallel.mesh import DATA_AXIS, make_mesh
from imgadapointr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from imgadapointr_tpu.utils.config import AttrDict


class _ListDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get(self, idx, rng):
        return "tax", f"m{idx}", {"x": np.full((4,), idx, np.float32)}


def test_loader_three_hosts_cover_dataset_equally():
    """3 hosts over 10 samples: every sample seen, equal per-host epoch
    length (pad by wrap-around), shards disjoint up to the padding."""
    ds = _ListDataset(10)
    loaders = [
        DataLoader(ds, 1, False, False, num_hosts=3, host_id=h) for h in range(3)
    ]
    per_host = [[m[0] for _, m, _ in l] for l in loaders]
    lens = [len(p) for p in per_host]
    assert lens == [4, 4, 4]  # ceil(10/3) each — no host starves the barrier
    seen = set().union(*[set(p) for p in per_host])
    assert seen == {f"m{i}" for i in range(10)}
    # disjoint except the 2 wrap-padding duplicates
    all_ids = sum(per_host, [])
    assert len(all_ids) - len(set(all_ids)) == 2


def test_loader_three_hosts_shuffled_consistent():
    """Shuffled epochs: hosts draw from ONE shared permutation (same seed +
    epoch), so the union still covers the dataset."""
    ds = _ListDataset(10)
    loaders = [
        DataLoader(ds, 1, True, False, seed=3, num_hosts=3, host_id=h)
        for h in range(3)
    ]
    for l in loaders:
        l.set_epoch(5)
    seen = set()
    for l in loaders:
        seen |= {m[0] for _, m, _ in l}
    assert seen == {f"m{i}" for i in range(10)}


def _tiny_runner(mesh_devices, tmpdir):
    """Runner on a restricted device subset (simulates a different dp
    width within one process)."""
    from imgadapointr_tpu.tools import runner as runner_mod

    cfg = AttrDict(
        {
            "optimizer": {"type": "AdamW", "kwargs": {"lr": 5e-4, "weight_decay": 5e-4}},
            "scheduler": {"type": "LambdaLR", "kwargs": {
                "decay_step": 21, "lr_decay": 0.9, "lowest_decay": 0.02}},
            "bnmscheduler": {"type": "Lambda", "kwargs": {
                "decay_step": 21, "bn_decay": 0.5, "bn_momentum": 0.9,
                "lowest_decay": 0.01}},
            "dataset": {"train": {"NAME": "SyntheticPCN", "N_POINTS": 64}},
            "model": {
                "NAME": "FoldingNet", "num_pred": 64, "encoder_channel": 32,
            },
            "total_bs": 8,
            "max_epoch": 2,
        }
    )
    args = types.SimpleNamespace(tp=1, experiment_path=tmpdir, seed=0)
    r = runner_mod.Runner(args, cfg)
    r.mesh = make_mesh(devices=mesh_devices, tp=1)
    return r, cfg


def test_resume_across_dp_width_change(tmp_path):
    """Train at dp=8, checkpoint, resume at dp=4 (and back): the host-side
    checkpoint is mesh-agnostic; step results must carry over bit-for-bit
    in the params and keep training."""
    devs = jax.devices()
    assert len(devs) >= 8
    exp = str(tmp_path)

    key = jax.random.PRNGKey(0)
    batch = {
        "partial": np.asarray(jax.random.normal(key, (8, 128, 3))),
        "gt": np.asarray(jax.random.normal(key, (8, 64, 3))),
    }

    r8, cfg = _tiny_runner(devs[:8], exp)
    state = r8.init_state(batch)
    state = r8.make_train_state(state, steps_per_epoch=1)
    state, m1 = r8.train_step(state, batch, jax.random.PRNGKey(1), 0.0)
    save_checkpoint(state, None, None, 0, "ckpt-last", exp, None)
    p_after_1 = jax.device_get(state["params"])

    # fresh runner on HALF the devices (dp 8 → 4)
    r4, _ = _tiny_runner(devs[:4], exp)
    assert r4.mesh.shape[DATA_AXIS] == 4
    state4 = r4.init_state(batch)
    state4 = r4.make_train_state(state4, steps_per_epoch=1)
    state4, meta = load_checkpoint(state4, "ckpt-last", exp)
    state4 = r4.shard_state(state4)

    # restored params identical to the dp=8 post-step params
    for a, b in zip(
        jax.tree.leaves(p_after_1), jax.tree.leaves(jax.device_get(state4["params"]))
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and training continues at the new width (8 % 4 == 0 → strict ok)
    state4, m2 = r4.train_step(state4, batch, jax.random.PRNGKey(2), 1.0)
    assert np.isfinite(float(m2["sparse_loss"]))

    # widen again: dp 4 → 8 resume from the dp=4 checkpoint
    save_checkpoint(state4, None, None, 1, "ckpt-last", exp, None)
    r8b, _ = _tiny_runner(devs[:8], exp)
    s8 = r8b.init_state(batch)
    s8 = r8b.make_train_state(s8, steps_per_epoch=1)
    s8, _ = load_checkpoint(s8, "ckpt-last", exp)
    s8 = r8b.shard_state(s8)
    s8, m3 = r8b.train_step(s8, batch, jax.random.PRNGKey(3), 2.0)
    assert np.isfinite(float(m3["sparse_loss"]))


# ------------------------------------------------------------------ --sp axis
def test_sp_sharded_loss_matches_unsharded():
    """chamfer_l1 under points_axis_sharding (the --sp train-loss route)
    equals the unsharded loss, values and gradients, with the batch dim
    riding 'data' and the point dims riding 'points'."""
    from imgadapointr_tpu.ops import chamfer_l1
    from imgadapointr_tpu.ops.chamfer import points_axis_sharding

    mesh = make_mesh(tp=1, sp=4)  # 2 dp × 4 sp over the 8 virtual devices
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 128, 3))

    def sharded_loss(a, b):
        with points_axis_sharding(mesh):
            return chamfer_l1(a, b)

    v_sp, g_sp = jax.jit(jax.value_and_grad(sharded_loss))(x, y)
    v_ref, g_ref = jax.jit(jax.value_and_grad(chamfer_l1))(x, y)
    assert abs(float(v_sp) - float(v_ref)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(g_sp), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_sp_context_falls_back_when_not_divisible():
    """Clouds whose point dim doesn't divide the sp axis use the unsharded
    op (per-call fallback, no error)."""
    from imgadapointr_tpu.ops import chamfer_l1
    from imgadapointr_tpu.ops.chamfer import points_axis_sharding

    mesh = make_mesh(tp=1, sp=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 130, 3))  # 130 % 4 != 0
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3))
    with points_axis_sharding(mesh):
        v = chamfer_l1(x, y)
    assert np.isfinite(float(v))


def test_sp_train_e2e(tmp_path):
    """`main.py --synthetic --sp 2` equivalent: one tiny epoch through
    run_net on the dp×sp virtual mesh trains and checkpoints."""
    import importlib.util
    import pathlib

    from imgadapointr_tpu.tools.runner import run_net
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    main_path = pathlib.Path(__file__).resolve().parents[1] / "main.py"
    mspec = importlib.util.spec_from_file_location("_repo_main_sp", main_path)
    main_mod = importlib.util.module_from_spec(mspec)
    mspec.loader.exec_module(main_mod)

    cfg = cfg_from_yaml_file("cfgs/PCN_models/AdaPoinTr-tiny.yaml")
    main_mod._swap_synthetic(cfg, train_len=8)
    cfg.total_bs = 4
    cfg.max_epoch = 1
    cfg.dataset.train.others.bs = 4
    cfg.dataset.val.others.bs = 1

    exp = str(tmp_path / "sp2")
    os.makedirs(exp, exist_ok=True)
    args = types.SimpleNamespace(
        experiment_path=exp, seed=0, num_workers=2, tp=1, sp=2,
        gdanet_w=None, val_freq=1, resume=False, start_ckpts=None,
        ckpts=None, emd=False, wandb=False, profile=False,
    )
    state = run_net(args, cfg, writers=None)
    assert os.path.exists(os.path.join(exp, "ckpt-last.ckpt"))
    for leaf in jax.tree.leaves(jax.device_get(state["params"])):
        assert np.all(np.isfinite(np.asarray(leaf)))
