"""Demo gallery parity (reference demo/app.py:40-101): synthetic sample
assets, gallery listing, model-picker config map, and the full gallery
reconstruct path (sample pcd + render + class one-hot → completion) —
headless, without gradio (absent in this image; the Blocks UI is a thin
shell over these functions)."""

import os

import numpy as np
import pytest


def test_make_samples_generates_assets(tmp_path):
    from demo.make_samples import SAMPLE_CLASSES, generate

    out = str(tmp_path / "samples")
    dirs = generate(out)
    assert len(dirs) == len(SAMPLE_CLASSES) == 8
    for class_id in SAMPLE_CLASSES:
        pcd = os.path.join(out, class_id, "00.pcd")
        png = os.path.join(out, class_id, "00.png")
        assert os.path.exists(pcd) and os.path.exists(png)
        from imgadapointr_tpu.utils.io_module import IO

        pts = np.asarray(IO.get(pcd))
        assert pts.shape == (2048, 3) and np.isfinite(pts).all()


def test_gallery_listing_and_model_map(tmp_path):
    import demo.app as app
    from demo.make_samples import generate

    out = str(tmp_path / "samples")
    generate(out)
    labels = app.list_samples(out)
    assert len(labels) == 8
    # labels are "<class_id> - <name>" with names from the synset dict
    assert any("chair" in l for l in labels)
    class_id, pcd, png = app.sample_paths(labels[0], out)
    assert os.path.exists(pcd) and os.path.exists(png)
    assert class_id == labels[0].split(" - ")[0]

    # all three reference models are selectable and their configs exist
    assert set(app.MODEL_CONFIGS) == {
        "SegEncAdaPoinTr",
        "ImgResNetEncAdaPoinTrVariableLoss",
        "ImgEncSegDecAdaPoinTrVariableLoss",
    }
    for cfg_path, _ in app.MODEL_CONFIGS.values():
        assert os.path.exists(os.path.join(app.BASE_DIR, cfg_path)), cfg_path


def test_gallery_reconstruct_path(tmp_path):
    """End-to-end gallery click: sample assets → PCReconstructor.predict
    with image + cls one-hot (tiny config standing in for the full model)."""
    from demo.make_samples import generate
    from demo.pcreconstructor import PCReconstructor
    from imgadapointr_tpu.datasets.pcn_dataset import CLASSES

    out = str(tmp_path / "samples")
    generate(out)
    rec = PCReconstructor("cfgs/SegImgPCN_models/ImgEncSegDec-tiny.yaml", "")
    class_id = "03001627"
    fine = rec.predict(
        os.path.join(out, class_id, "00.pcd"),
        os.path.join(out, class_id, "00.png"),
        class_id, CLASSES,
    )
    fine = np.asarray(fine)
    assert fine.ndim == 2 and fine.shape[1] == 3 and np.isfinite(fine).all()


def test_pcreconstructor_loads_reference_pth(tmp_path):
    """Serving accepts reference torch checkpoints directly: a .pth in the
    reference save format ({'base_model': sd}, DDP 'module.' prefixes) is
    converted by model name at load (demo/pcreconstructor.py)."""
    import jax
    import torch

    from demo.pcreconstructor import PCReconstructor
    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.tools.convert_torch import convert_adapointr
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("cfgs/PCN_models/AdaPoinTr-tiny.yaml").model
    spec = build_model_spec(cfg)
    key = jax.random.PRNGKey(3)
    variables = jax.jit(
        lambda k: spec.module.init(
            {"params": k, "noise": k}, jax.numpy.zeros((1, 2048, 3)), train=False
        )
    )(key)

    def leaf(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    # synthesize a torch sd from the converter's own mapping (inverse
    # transforms), so converted values are exactly the flax init values
    probe = convert_adapointr({}, cfg)
    sd = {}
    for tkey, transform, fpaths in probe["mapping"]:
        try:
            if transform.startswith("split:"):
                outs = [np.asarray(leaf(variables["params"], p)) for p in fpaths]
                sd[tkey] = np.concatenate(outs, axis=0).T.astype(np.float32)
            elif transform == "linear":
                sd[tkey] = np.asarray(leaf(variables["params"], fpaths)).T.astype(np.float32)
            elif transform == "direct:stats":
                sd[tkey] = np.asarray(leaf(variables["batch_stats"], fpaths)).astype(np.float32)
            else:
                sd[tkey] = np.asarray(leaf(variables["params"], fpaths)).astype(np.float32)
        except KeyError:
            continue
    pth = str(tmp_path / "AdaPoinTr.pth")
    torch.save(
        {"base_model": {"module." + k: torch.from_numpy(v) for k, v in sd.items()}},
        pth,
    )

    rec = PCReconstructor("cfgs/PCN_models/AdaPoinTr-tiny.yaml", pth)
    # the loaded params equal the synthesized source weights
    got = leaf(rec.state["params"], ("base_model", "coarse_pred1", "kernel"))
    want = leaf(variables["params"], ("base_model", "coarse_pred1", "kernel"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    pcd = str(tmp_path / "in.pcd")
    from demo.make_samples import make_sample, write_pcd

    partial, _ = make_sample(seed=1)
    write_pcd(pcd, partial)
    fine = np.asarray(rec.predict(pcd))
    assert fine.ndim == 2 and fine.shape[1] == 3 and np.isfinite(fine).all()
