"""Config-tree health: every shipped YAML loads, and the train-time
augmentation branches (ShapeNet-55 crop, CARS dropping) are reachable from
configs alone (reference tools/runner.py:139-181 reads
config.dataset.train._base_; our config system flattens the include)."""

import glob
import os
import types

import pytest

from imgadapointr_tpu.utils.config import cfg_from_yaml_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(rel):
    return cfg_from_yaml_file(os.path.join(REPO, rel), root=REPO)


def test_all_configs_load():
    paths = glob.glob(os.path.join(REPO, "cfgs", "*_models", "*.yaml"))
    assert len(paths) >= 16
    for p in paths:
        cfg = cfg_from_yaml_file(p, root=REPO)
        assert "model" in cfg and "NAME" in cfg.model, p
        if "dataset" in cfg:
            for split in cfg.dataset.values():
                assert "NAME" in split, p  # _base_ include resolved


def _runner_for(rel):
    from imgadapointr_tpu.tools.runner import Runner

    cfg = _load(rel)
    args = types.SimpleNamespace(tp=1)
    return Runner(args, cfg)


def test_shapenet55_config_enables_train_crop():
    r = _runner_for("cfgs/ShapeNet55_models/AdaPoinTr.yaml")
    assert r.shapenet_train_crop
    assert not r.cars_dropping
    assert r.train_npoints == 8192


def test_kitti_config_enables_cars_dropping():
    r = _runner_for("cfgs/KITTI_models/AdaPoinTr.yaml")
    assert r.cars_dropping
    assert not r.shapenet_train_crop


def test_pcn_config_enables_neither():
    r = _runner_for("cfgs/PCN_models/AdaPoinTr.yaml")
    assert not r.shapenet_train_crop
    assert not r.cars_dropping


def test_every_shipped_config_builds_a_model_spec():
    """Config-key drift guard: every cfgs/*_models/*.yaml must build its
    ModelSpec (flax module + loss) through the registry."""
    from imgadapointr_tpu.models.build import build_model_spec

    paths = sorted(glob.glob(os.path.join(REPO, "cfgs", "*_models", "*.yaml")))
    for p in paths:
        cfg = cfg_from_yaml_file(p, root=REPO)
        spec = build_model_spec(cfg.model)
        assert spec.module is not None and callable(spec.loss_fn), p


def test_dataset_config_fields_match_dataset_classes():
    sn = _load("cfgs/dataset_configs/ShapeNet55.yaml")
    for k in ("DATA_PATH", "PC_PATH", "N_POINTS"):
        assert k in sn
    kitti = _load("cfgs/dataset_configs/KITTI.yaml")
    for k in ("CLOUD_PATH", "BBOX_PATH", "CATEGORY_FILE_PATH"):
        assert k in kitti
    cars = _load("cfgs/dataset_configs/PCNCars.yaml")
    assert cars.CARS is True


def test_shapenet55_train_step_runs_with_crop_branch():
    """One jitted train step through the ShapeNet-55 path: the per-step
    random crop (gt -> partial) is applied inside the step (reference
    tools/runner.py:150-159) and produces a finite loss."""
    import jax
    import numpy as np

    from imgadapointr_tpu.tools.runner import Runner
    from imgadapointr_tpu.utils.config import AttrDict

    cfg = AttrDict(
        {
            "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 5e-4}},
            "scheduler": {"type": "LambdaLR",
                          "kwargs": {"decay_step": 2, "lr_decay": 0.9, "lowest_decay": 0.02}},
            "bnmscheduler": {"type": "Lambda",
                             "kwargs": {"decay_step": 2, "bn_decay": 0.5,
                                        "bn_momentum": 0.9, "lowest_decay": 0.01}},
            "max_epoch": 2,
            "model": {
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
            },
            "dataset": {"train": {"NAME": "ShapeNet", "N_POINTS": 128,
                                  "others": {"subset": "train"}}},
        }
    )
    r = Runner(types.SimpleNamespace(tp=1, seed=0), cfg)
    assert r.shapenet_train_crop and r.train_npoints == 128
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(4, 128, 3)).astype(np.float32)
    # the ShapeNet loader returns partial == gt; the step crops it itself
    batch = {"partial": gt, "gt": gt}
    state = r.init_state(batch)
    state = r.make_train_state(state, steps_per_epoch=2)
    state, metrics = r.train_step(state, batch, jax.random.PRNGKey(1), 0.0)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["total_loss"]) > 0
