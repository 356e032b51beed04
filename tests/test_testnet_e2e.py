"""End-to-end `--test` protocols over real on-disk fixtures.

Exercises tools/runner.py:446-593 exactly as `main.py --test` does — config
from the cfgs schema, dataset classes reading real files, checkpoint loaded
from disk — for all three protocol branches:

- PCN: per-taxonomy table with EMD on (reference tools/runner.py:462-562),
- ShapeNet-55: 8-fixed-viewpoint crop protocol (reference :627-653),
- KITTI: gt-free visualisation dump (reference :655-665).
"""

import json
import os
import types

import numpy as np
import pytest

from imgadapointr_tpu.tools.runner import Runner
from imgadapointr_tpu.tools.runner import test_net as run_test_net
from imgadapointr_tpu.utils.checkpoint import save_checkpoint
from imgadapointr_tpu.utils.config import AttrDict
from imgadapointr_tpu.utils.metrics import METRIC_NAMES


def _write_pcd(path, pts):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(
            (
                "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                f"COUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n"
                f"POINTS {len(pts)}\nDATA binary\n"
            ).encode()
        )
        f.write(np.ascontiguousarray(pts, "<f4").tobytes())


def _tiny_model(num_points):
    return AttrDict(
        {
            "NAME": "AdaPoinTr", "num_query": 16, "num_points": num_points,
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


def _args(exp_path, ckpts, **kw):
    a = types.SimpleNamespace(
        experiment_path=exp_path, ckpts=ckpts, seed=0, num_workers=2, tp=1,
    )
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _make_checkpoint(config, exp_path, example):
    """Init a random model and write it to disk the way training does."""
    runner = Runner(types.SimpleNamespace(tp=1), config)
    state = runner.init_state(example)
    state = {"params": state["params"], "batch_stats": state["batch_stats"]}
    save_checkpoint(state, None, None, 0, "ckpt-best", exp_path, None)
    return os.path.join(exp_path, "ckpt-best.ckpt")


def test_testnet_pcn_with_emd(tmp_path, capsys):
    root = str(tmp_path / "pcn")
    rng = np.random.RandomState(0)
    cats = [
        {"taxonomy_id": "02691156", "taxonomy_name": "airplane",
         "train": [], "val": [], "test": ["m1"]},
        {"taxonomy_id": "03001627", "taxonomy_name": "chair",
         "train": [], "val": [], "test": ["c0"]},
    ]
    os.makedirs(root)
    with open(os.path.join(root, "PCN.json"), "w") as f:
        json.dump(cats, f)
    for dc in cats:
        for m in dc["test"]:
            _write_pcd(
                os.path.join(root, "test", "partial", dc["taxonomy_id"], m, "00.pcd"),
                rng.randn(300, 3).astype(np.float32) * 0.3,
            )
            _write_pcd(
                os.path.join(root, "test", "complete", dc["taxonomy_id"], f"{m}.pcd"),
                rng.randn(1024, 3).astype(np.float32) * 0.3,
            )
    dataset_cfg = {
        "NAME": "PCN",
        "CATEGORY_FILE_PATH": os.path.join(root, "PCN.json"),
        "N_POINTS": 1024, "N_RENDERINGS": 1,
        "PARTIAL_POINTS_PATH": os.path.join(root, "%s/partial/%s/%s/%02d.pcd"),
        "COMPLETE_POINTS_PATH": os.path.join(root, "%s/complete/%s/%s.pcd"),
        "CARS": False, "others": {"subset": "test", "bs": 1},
    }
    config = AttrDict(
        {"model": _tiny_model(1024), "dataset": {"test": dataset_cfg},
         "consider_metric": "CDL1"}
    )
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    # build the checkpoint from one real loader batch
    from imgadapointr_tpu.tools.builder import dataset_builder

    _, loader = dataset_builder(_args(exp, None), AttrDict(dataset_cfg))
    _, _, example = next(iter(loader))
    ckpt = _make_checkpoint(config, exp, example)

    result = run_test_net(_args(exp, ckpt, emd=True), config)
    text = capsys.readouterr().out

    assert set(result) == set(METRIC_NAMES)
    for name, v in result.items():
        assert np.isfinite(v), (name, v)
    assert result["EMDistance"] > 0, "require_emd must produce a real EMD"
    # printed per-taxonomy table: header + one row per taxonomy + overall
    assert "TEST RESULTS" in text
    for tax, name in [("02691156", "airplane"), ("03001627", "chair")]:
        assert tax in text and name in text
    assert "Overall" in text


def test_testnet_refuses_without_ckpts(tmp_path):
    config = AttrDict(
        {"model": _tiny_model(256),
         "dataset": {"test": {"NAME": "SyntheticPCN", "N_POINTS": 256,
                              "LENGTH": 2, "others": {"subset": "test", "bs": 1}}}}
    )
    with pytest.raises(ValueError, match="ckpts"):
        run_test_net(_args(str(tmp_path), None), config)


def test_testnet_shapenet55_eight_crop(tmp_path, capsys):
    root = str(tmp_path / "sn55")
    pc_dir = os.path.join(root, "pc")
    os.makedirs(pc_dir)
    rng = np.random.RandomState(1)
    models = ["04379243-t0", "02691156-a0"]
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write("\n".join(f"{m}.npy" for m in models) + "\n")
    for m in models:
        np.save(os.path.join(pc_dir, f"{m}.npy"),
                rng.randn(8192, 3).astype(np.float32) * 0.3)
    dataset_cfg = {
        "NAME": "ShapeNet", "DATA_PATH": root, "PC_PATH": pc_dir,
        "N_POINTS": 8192, "others": {"subset": "test", "bs": 1},
    }
    config = AttrDict(
        {"model": _tiny_model(512), "dataset": {"test": dataset_cfg},
         "consider_metric": "CDL2"}
    )
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    from imgadapointr_tpu.tools.builder import dataset_builder

    _, loader = dataset_builder(_args(exp, None), AttrDict(dataset_cfg))
    _, _, example = next(iter(loader))
    ckpt = _make_checkpoint(config, exp, example)

    result = run_test_net(_args(exp, ckpt, mode="hard"), config)
    assert set(result) == set(METRIC_NAMES)
    assert np.isfinite(result["CDL1"]) and result["CDL1"] > 0
    assert "[ShapeNet-55 hard]" in capsys.readouterr().out

    # batched gt clouds (--val_bs analog): 8 crops × 2 gts in one forward
    # must reproduce the bs=1 table (per-row reductions, exact attribution)
    dataset_cfg2 = dict(dataset_cfg, others={"subset": "test", "bs": 2})
    config2 = AttrDict(
        {"model": _tiny_model(512), "dataset": {"test": dataset_cfg2},
         "consider_metric": "CDL2"}
    )
    result2 = run_test_net(_args(exp, ckpt, mode="hard"), config2)
    for k in result:
        np.testing.assert_allclose(result2[k], result[k], rtol=3e-5, atol=1e-6)


def test_testnet_kitti_dump(tmp_path):
    root = str(tmp_path / "kitti")
    os.makedirs(os.path.join(root, "cars"))
    os.makedirs(os.path.join(root, "bboxes"))
    rng = np.random.RandomState(2)
    names = ["frame0_car0", "frame1_car2"]
    with open(os.path.join(root, "KITTI.json"), "w") as f:
        json.dump(names, f)
    # axis-aligned unit-ish bbox corners (8, 3) in the reference's .txt format
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-0.4, 0.4) for z in (-0.3, 0.3)],
        np.float32,
    )[[0, 1, 3, 2, 4, 5, 7, 6]]  # ring order: yaw derives from corners 0↔3
    for n in names:
        _write_pcd(os.path.join(root, "cars", f"{n}.pcd"),
                   rng.randn(200, 3).astype(np.float32) * 0.2)
        np.savetxt(os.path.join(root, "bboxes", f"{n}.txt"), corners)
    dataset_cfg = {
        "NAME": "KITTI",
        "CLOUD_PATH": os.path.join(root, "cars", "%s.pcd"),
        "BBOX_PATH": os.path.join(root, "bboxes", "%s.txt"),
        "CATEGORY_FILE_PATH": os.path.join(root, "KITTI.json"),
        "N_POINTS": 2048, "others": {"subset": "test", "bs": 1},
    }
    config = AttrDict(
        {"model": _tiny_model(256), "dataset": {"test": dataset_cfg},
         "consider_metric": "CDL1"}
    )
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    from imgadapointr_tpu.tools.builder import dataset_builder

    _, loader = dataset_builder(_args(exp, None), AttrDict(dataset_cfg))
    _, _, example = next(iter(loader))
    ckpt = _make_checkpoint(config, exp, example)

    run_test_net(_args(exp, ckpt), config)
    vis = os.path.join(exp, "vis_result")
    files = sorted(os.listdir(vis))
    assert len(files) == 2 and all(f.endswith(".jpg") for f in files)
    for n in names:
        assert any(n in f for f in files)


def test_testnet_accepts_reference_pth(tmp_path, capsys):
    """`--test --ckpts model.pth` must work straight off a reference-format
    torch checkpoint (the reference publishes pretrained .pth files; this is
    a migrating user's first action). Roundtrip: export the tiny flax model
    to the reference save format, then test_net from that file — the table
    must equal testing from the native .ckpt of the same weights."""
    import torch

    from imgadapointr_tpu.tools.convert_torch import export_adapointr_torch

    config = AttrDict(
        {"model": _tiny_model(256),
         "dataset": {"test": {"NAME": "SyntheticPCN", "N_POINTS": 256,
                              "LENGTH": 4, "others": {"subset": "test", "bs": 1}}},
         "consider_metric": "CDL1"}
    )
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    from imgadapointr_tpu.tools.builder import dataset_builder

    _, loader = dataset_builder(
        _args(exp, None), config.dataset["test"]
    )
    _, _, example = next(iter(loader))
    ckpt = _make_checkpoint(config, exp, example)

    # export the SAME weights to the reference torch format
    from imgadapointr_tpu.utils.checkpoint import load_checkpoint

    runner = Runner(types.SimpleNamespace(tp=1), config)
    state = runner.init_state(example)
    state = {"params": state["params"], "batch_stats": state["batch_stats"]}
    state, _ = load_checkpoint(state, "ckpt-best", exp)
    sd = export_adapointr_torch(state["params"], state["batch_stats"], config.model)
    pth = str(tmp_path / "reference.pth")
    torch.save(
        {"base_model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        pth,
    )

    r_native = run_test_net(_args(exp, ckpt, emd=False), config)
    r_pth = run_test_net(_args(exp, pth, emd=False), config)
    for k in r_native:
        np.testing.assert_allclose(r_pth[k], r_native[k], rtol=1e-5, atol=1e-7)
