"""Tests: torch→flax GDANet conversion round-trip, inference CLI, demo API."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.models.gdanet import GDANet
from imgadapointr_tpu.tools.convert_torch import convert_gdanet


def _synthetic_torch_gdanet_state():
    """A torch-style GDANet state_dict with the reference's names/shapes
    (models/segmentation/GDANet_ptseg.py:12-70)."""
    rs = np.random.RandomState(0)
    sd = {}

    def conv_bn(conv, bn, cin, cout):
        sd[f"{conv}.weight"] = (rs.randn(cout, cin, 1) * 0.05).astype(np.float32)
        sd[f"{conv}.bias"] = rs.randn(cout).astype(np.float32)
        sd[f"{bn}.weight"] = np.abs(rs.randn(cout)).astype(np.float32) * 0.5
        sd[f"{bn}.bias"] = rs.randn(cout).astype(np.float32)
        sd[f"{bn}.running_mean"] = rs.randn(cout).astype(np.float32)
        sd[f"{bn}.running_var"] = np.abs(rs.randn(cout)).astype(np.float32)

    conv_bn("conv1.0", "bn1", 9, 64)
    conv_bn("conv11.0", "bn11", 64, 64)
    conv_bn("conv12.0", "bn12", 128, 64)
    conv_bn("conv2.0", "bn2", 134, 64)
    conv_bn("conv21.0", "bn21", 64, 64)
    conv_bn("conv22.0", "bn22", 128, 64)
    conv_bn("conv3.0", "bn3", 262, 128)
    conv_bn("conv31.0", "bn31", 128, 128)
    conv_bn("conv32.0", "bn32", 128, 128)
    conv_bn("conv4.0", "bn4", 256, 512)
    conv_bn("convc.0", "bnc", 16, 64)
    conv_bn("conv5.0", "bn5", 832, 256)
    conv_bn("conv6.0", "bn6", 256, 256)
    conv_bn("conv7.0", "bn7", 256, 128)
    sd["conv8.weight"] = (rs.randn(50, 128, 1) * 0.05).astype(np.float32)
    sd["conv8.bias"] = rs.randn(50).astype(np.float32)
    for sg in ("SGCAM_1s", "SGCAM_1g", "SGCAM_2s", "SGCAM_2g"):
        for nm, cin, cout in (("g", 64, 32), ("theta", 64, 32), ("phi", 64, 32)):
            sd[f"{sg}.{nm}.weight"] = (rs.randn(cout, cin, 1) * 0.05).astype(np.float32)
            sd[f"{sg}.{nm}.bias"] = rs.randn(cout).astype(np.float32)
        sd[f"{sg}.W.0.weight"] = (rs.randn(64, 32, 1) * 0.05).astype(np.float32)
        sd[f"{sg}.W.0.bias"] = rs.randn(64).astype(np.float32)
        sd[f"{sg}.W.1.weight"] = (rs.randn(64) * 0.1).astype(np.float32)
        sd[f"{sg}.W.1.bias"] = rs.randn(64).astype(np.float32)
        sd[f"{sg}.W.1.running_mean"] = rs.randn(64).astype(np.float32)
        sd[f"{sg}.W.1.running_var"] = np.abs(rs.randn(64)).astype(np.float32)
    return sd


def test_gdanet_conversion_covers_module_tree():
    sd = _synthetic_torch_gdanet_state()
    result = convert_gdanet(sd)
    assert not result["missing"], result["missing"]

    # converted tree must structurally cover an initialized GDANet
    model = GDANet(50)
    key = jax.random.PRNGKey(0)
    coor = jax.random.normal(key, (1, 64, 3))
    normals = jax.random.normal(key, (1, 64, 3))
    cls = jnp.zeros((1, 16))
    variables = model.init({"params": key}, coor, normals, cls)

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k,))
        return out

    want_p = paths(variables["params"])
    got_p = paths(result["params"])
    assert got_p == want_p, (sorted(want_p - got_p)[:5], sorted(got_p - want_p)[:5])

    # shapes must match too
    def leaf(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    for p in want_p:
        assert leaf(result["params"], p).shape == leaf(variables["params"], p).shape, p

    # converted params run
    out_feat, out_lp = model.apply(
        {"params": result["params"], "batch_stats": result["batch_stats"]},
        coor, normals, cls,
    )
    assert np.isfinite(np.asarray(out_feat)).all()


def test_inference_cli(tmp_path):
    """End-to-end: train-free inference over the CLI surface."""
    from imgadapointr_tpu.tools import inference

    # make an input cloud + a checkpoint from a fresh tiny model
    rs = np.random.RandomState(0)
    pc = rs.randn(300, 3).astype(np.float32)
    pc_path = str(tmp_path / "cloud.npy")
    np.save(pc_path, pc)

    cfg_path = "cfgs/PCN_models/AdaPoinTr-tiny.yaml"
    if not os.path.exists(cfg_path):
        pytest.skip("run from repo root")

    # build + save an untrained checkpoint
    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.utils.checkpoint import save_checkpoint
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file(cfg_path)
    spec = build_model_spec(config.model)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda k, x: spec.module.init({"params": k, "noise": k}, x, train=False)
    )(key, jnp.zeros((1, 2048, 3)))
    state = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
    save_checkpoint(state, None, None, 0, "ckpt-test", str(tmp_path))

    out_root = str(tmp_path / "out")
    inference.main(
        [
            "--model_config", cfg_path,
            "--model_checkpoint", str(tmp_path / "ckpt-test.ckpt"),
            "--pc", pc_path,
            "--out_pc_root", out_root,
        ]
    )
    fine = np.load(os.path.join(out_root, "cloud", "fine.npy"))
    assert fine.shape == (config.model.num_points, 3)
    assert np.isfinite(fine).all()


def test_adapointr_conversion_covers_module_tree():
    """Round-trip: synthesize a torch state dict from the converter's own
    mapping (inverse shapes/transposes), convert, and require exact coverage
    of the flax AdaPoinTr tree with matching shapes and values."""
    from imgadapointr_tpu.models import AdaPoinTrBase
    from imgadapointr_tpu.tools.convert_torch import convert_adapointr
    from imgadapointr_tpu.utils.config import AttrDict

    cfg = AttrDict(
        {
            "NAME": "AdaPoinTr", "num_query": 16, "num_points": 128,
            "center_num": [32, 16], "global_feature_dim": 64,
            "encoder_type": "graph", "decoder_type": "fc",
            "encoder_config": {
                "embed_dim": 48, "depth": 2, "num_heads": 6, "k": 4, "n_group": 2,
                "mlp_ratio": 2.0, "block_style_list": ["attn-graph", "attn"],
                "combine_style": "concat",
            },
            "decoder_config": {
                "embed_dim": 48, "depth": 2, "num_heads": 6, "k": 4, "n_group": 2,
                "mlp_ratio": 2.0,
                "self_attn_block_style_list": ["attn-deform", "attn"],
                "self_attn_combine_style": "concat",
                "cross_attn_block_style_list": ["attn-graph", "attn"],
                "cross_attn_combine_style": "concat",
            },
        }
    )
    model = AdaPoinTrBase(cfg)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (2, 128, 3))
    variables = jax.jit(
        lambda k, x: model.init({"params": k, "noise": k}, x, train=True)
    )(key, xyz)

    def leaf(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    # pass 1: mapping only (empty sd)
    probe = convert_adapointr({}, cfg)
    # synthesize torch arrays whose converted shapes equal the flax leaves
    rs = np.random.RandomState(0)
    sd = {}
    for tkey, transform, fpaths in probe["mapping"]:
        try:
            if transform.startswith("split:"):
                widths = [int(w) for w in transform.split(":")[1].split(",")]
                outs = [leaf(variables["params"], p) for p in fpaths]
                sd[tkey] = np.concatenate(
                    [np.asarray(o) for o in outs], axis=0
                ).T.astype(np.float32)
            elif transform == "linear":
                fl = leaf(variables["params"], fpaths)
                sd[tkey] = np.asarray(fl).T.astype(np.float32)
            elif transform == "direct:stats":
                fl = leaf(variables["batch_stats"], fpaths)
                sd[tkey] = np.asarray(fl).astype(np.float32)
            else:
                fl = leaf(variables["params"], fpaths)
                sd[tkey] = np.asarray(fl).astype(np.float32)
        except KeyError:
            raise AssertionError(f"mapping targets unknown flax path {fpaths} ({tkey})")

    result = convert_adapointr(sd, cfg)
    assert not result["missing"], result["missing"][:5]

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k,))
        return out

    want = paths(variables["params"])
    got = paths(result["params"])
    assert got == want, (sorted(want - got)[:8], sorted(got - want)[:8])
    for p in want:
        a, b = leaf(result["params"], p), leaf(variables["params"], p)
        assert a.shape == b.shape, (p, a.shape, b.shape)
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-6, err_msg=str(p))
    assert paths(result["batch_stats"]) == paths(variables["batch_stats"])


def test_load_gdanet_weights_from_torch_file(tmp_path):
    """--gdanet_w end to end through a real torch-saved .pth: the reference
    saves {'model': state_dict} (tools/runner.py:57-58); common
    'model_state_dict' wrappers must work too; a checkpoint where nothing
    matches must raise instead of silently training on random frozen
    weights (the pre-fix behaviour)."""
    import torch

    from imgadapointr_tpu.tools.convert_torch import load_gdanet_weights

    sd = {k: torch.from_numpy(v) for k, v in _synthetic_torch_gdanet_state().items()}
    for wrapper in ("model", "model_state_dict"):
        p = str(tmp_path / f"gdanet_{wrapper}.pth")
        torch.save({wrapper: sd}, p)
        params, stats = load_gdanet_weights(p)
        assert "conv1_conv" in params and "conv1_bn" in stats
        np.testing.assert_allclose(
            params["conv1_conv"]["bias"], sd["conv1.0.bias"].numpy()
        )

    junk = str(tmp_path / "junk.pth")
    torch.save({"model": {"not_a_layer.weight": torch.zeros(3)}}, junk)
    with pytest.raises(ValueError, match="no GDANet weights matched"):
        load_gdanet_weights(junk)


def test_inference_cli_loads_reference_pth(tmp_path):
    """The inference CLI loads reference torch .pth checkpoints directly,
    like main.py --test --ckpts and the demo (shared converter dispatch)."""
    import torch

    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.tools import inference
    from imgadapointr_tpu.tools.convert_torch import export_adapointr_torch
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    cfg_path = "cfgs/PCN_models/AdaPoinTr-tiny.yaml"
    if not os.path.exists(cfg_path):
        pytest.skip("run from repo root")
    config = cfg_from_yaml_file(cfg_path)
    spec = build_model_spec(config.model)
    key = jax.random.PRNGKey(1)
    variables = jax.jit(
        lambda k, x: spec.module.init({"params": k, "noise": k}, x, train=False)
    )(key, jnp.zeros((1, 2048, 3)))
    # export to the reference's on-disk format
    sd = export_adapointr_torch(
        variables["params"], variables.get("batch_stats", {}), config.model
    )
    pth = str(tmp_path / "model.pth")
    torch.save({"base_model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, pth)

    rs = np.random.RandomState(2)
    pc_path = str(tmp_path / "cloud.npy")
    np.save(pc_path, rs.randn(300, 3).astype(np.float32))
    out_root = str(tmp_path / "out")
    inference.main(
        [
            "--model_config", cfg_path,
            "--model_checkpoint", pth,
            "--pc", pc_path,
            "--out_pc_root", out_root,
        ]
    )
    fine = np.load(os.path.join(out_root, "cloud", "fine.npy"))
    assert fine.shape == (config.model.num_points, 3)
    assert np.isfinite(fine).all()


def test_demo_resolve_ckpt_probes_pth_sibling(tmp_path, capsys):
    """get_reconstructor probes the .pth sibling the reference demo ships
    (pretrained/<Name>.pth) before falling back to random-init."""
    import sys

    sys.path.insert(0, os.getcwd())
    from demo.app import _resolve_ckpt

    pth = tmp_path / "SegEncAdaPoinTr.pth"
    pth.write_bytes(b"x")
    got = _resolve_ckpt(str(tmp_path), "SegEncAdaPoinTr.ckpt", "SegEncAdaPoinTr")
    assert got == str(pth)

    got = _resolve_ckpt(str(tmp_path), "ImgAdaPoinTr.ckpt", "Img")
    assert got == ""
    assert "RANDOM-INIT" in capsys.readouterr().out
