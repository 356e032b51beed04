"""Gradio demo app with sample gallery + multi-model picker
(reference demo/app.py:40-101).

Layout mirrors the reference: a dropdown of demo/samples/<class> entries
(pcd + rendered view per taxonomy), a 3-model picker (SegEncAdaPoinTr /
ImgResNetEncAdaPoinTrVariableLoss / ImgEncSegDecAdaPoinTrVariableLoss),
"Load and Visualize" for the partial cloud and "Reconstruct" for the
completion, both as plotly 3D scatters. A separate upload tab keeps the
round-2 file-upload path.

Sample assets are synthetic (``python demo/make_samples.py`` — ShapeNet
cannot be redistributed) and are generated on first launch if missing.
Checkpoints: put ``<ModelName>.ckpt`` under ``pretrained/`` (or pass
--ckpt-dir); a missing checkpoint falls back to random init with a warning,
so the app stays drivable end-to-end without downloads.

Run: ``python demo/app.py [--port 8080] [--ckpt-dir pretrained]``
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE_DIR)

from demo.pcreconstructor import PCReconstructor  # noqa: E402
from imgadapointr_tpu.datasets.pcn_dataset import CLASSES  # noqa: E402

SAMPLES_DIR = os.path.join(BASE_DIR, "demo", "samples")

# model name → (config, default checkpoint name); reference demo/app.py:60-65
MODEL_CONFIGS = {
    "SegEncAdaPoinTr": (
        "cfgs/SegImgPCN_models/SegEncAdaPoinTr.yaml", "SegEncAdaPoinTr.ckpt"),
    "ImgResNetEncAdaPoinTrVariableLoss": (
        "cfgs/ImgPCN_models/ImgResNetEncAdaPoinTrVariableLoss.yaml",
        "ImgAdaPoinTr.ckpt"),
    "ImgEncSegDecAdaPoinTrVariableLoss": (
        "cfgs/SegImgPCN_models/ImgEncSegDecAdaPoinTrVariableLoss.yaml",
        "ImgEncSegDecAPTr.ckpt"),
}


def class_names():
    path = os.path.join(BASE_DIR, "cfgs", "shapenet_synset_dict.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def ensure_samples(samples_dir: str = SAMPLES_DIR) -> None:
    if not os.path.isdir(samples_dir) or not os.listdir(samples_dir):
        from demo.make_samples import generate

        generate(samples_dir)


def list_samples(samples_dir: str = SAMPLES_DIR) -> list[str]:
    """Gallery labels '<class_id> - <name>' (reference app.py:68-74)."""
    names = class_names()
    out = []
    for class_id in sorted(os.listdir(samples_dir)):
        if os.path.isdir(os.path.join(samples_dir, class_id)):
            out.append(f"{class_id} - {names.get(class_id, 'Unknown')}")
    return out


def sample_paths(label: str, samples_dir: str = SAMPLES_DIR):
    class_id = label.split(" - ")[0]
    return (
        class_id,
        os.path.join(samples_dir, class_id, "00.pcd"),
        os.path.join(samples_dir, class_id, "00.png"),
    )


@functools.lru_cache(maxsize=3)
def _reconstructor(config_path: str, ckpt: str) -> PCReconstructor:
    return PCReconstructor(os.path.join(BASE_DIR, config_path), ckpt)


def get_reconstructor(model_name: str, ckpt_dir: str) -> PCReconstructor:
    # checkpoint existence is re-checked on every call (the cache keys on
    # the RESOLVED path), so dropping the .ckpt in after launch picks up
    # real weights instead of pinning the random-init fallback forever
    config_path, ckpt_name = MODEL_CONFIGS[model_name]
    ckpt = _resolve_ckpt(ckpt_dir, ckpt_name, model_name)
    return _reconstructor(config_path, ckpt)


def _resolve_ckpt(ckpt_dir: str, ckpt_name: str, model_name: str) -> str:
    """Probe <name>.ckpt then the <name>.pth sibling (the names a reference
    user's pretrained/ directory carries — PCReconstructor routes .pth
    through the torch-checkpoint converter); '' means random-init."""
    ckpt = os.path.join(ckpt_dir, ckpt_name)
    if os.path.exists(ckpt):
        return ckpt
    pth = ckpt[: -len(".ckpt")] + ".pth"
    if os.path.exists(pth):
        return pth
    print(f"[demo] WARNING: neither {ckpt} nor {pth} found — "
          f"{model_name} runs RANDOM-INIT")
    return ""


def load_sample_points(label: str, samples_dir: str = SAMPLES_DIR) -> np.ndarray:
    from imgadapointr_tpu.utils.io_module import IO

    _, pcd, _ = sample_paths(label, samples_dir)
    return np.asarray(IO.get(pcd), np.float32)


def reconstruct_sample(
    label: str, model_name: str, ckpt_dir: str = "pretrained",
    samples_dir: str = SAMPLES_DIR,
) -> np.ndarray:
    """Full gallery path: sample pcd + render + class one-hot → completion."""
    class_id, pcd, png = sample_paths(label, samples_dir)
    rec = get_reconstructor(model_name, ckpt_dir)
    return rec.predict(pcd, png, class_id, CLASSES)


def make_figure(points: np.ndarray, title: str = ""):
    import plotly.graph_objects as go

    return go.Figure(
        data=[
            go.Scatter3d(
                x=points[:, 0], y=points[:, 1], z=points[:, 2],
                mode="markers", marker=dict(size=1.5, color=points[:, 2]),
            )
        ],
        layout=dict(title=title, margin=dict(l=0, r=0, b=0, t=24)),
    )


def build_app(ckpt_dir: str = "pretrained"):
    """Construct (but do not launch) the gradio Blocks app."""
    import gradio as gr

    ensure_samples()
    samples = list_samples()

    with gr.Blocks(title="ImgAdaPoinTr point-cloud completion") as app:
        gr.Markdown("## 3D Point Cloud Visualization and Reconstruction")
        with gr.Tab("Sample gallery"):
            with gr.Row():
                sample_dd = gr.Dropdown(
                    label="Select an Incomplete Sample Point Cloud File",
                    choices=samples, value=samples[0] if samples else None,
                )
                model_dd = gr.Dropdown(
                    label="Select a Model", choices=list(MODEL_CONFIGS),
                    value="SegEncAdaPoinTr",
                )
                visualize_btn = gr.Button("Load and Visualize")
            original_plot = gr.Plot()
            reconstruct_btn = gr.Button("Reconstruct")
            recon_plot = gr.Plot()

            visualize_btn.click(
                lambda label: make_figure(load_sample_points(label), "partial input"),
                inputs=[sample_dd], outputs=original_plot,
            )
            reconstruct_btn.click(
                lambda label, model: make_figure(
                    reconstruct_sample(label, model, ckpt_dir), "completion"
                ),
                inputs=[sample_dd, model_dd], outputs=recon_plot,
            )

        with gr.Tab("Upload"):
            pc_file = gr.File(label="partial point cloud (.pcd/.npy/.ply)")
            img_file = gr.Image(label="rendered view", type="filepath")
            cls_dd = gr.Dropdown(sorted(CLASSES), label="ShapeNet class")
            up_model = gr.Dropdown(
                list(MODEL_CONFIGS), label="Model", value="SegEncAdaPoinTr"
            )
            up_btn = gr.Button("Reconstruct upload")
            up_plot = gr.Plot()
            up_btn.click(
                lambda pc, img, cid, model: make_figure(
                    get_reconstructor(model, ckpt_dir).predict(pc, img, cid, CLASSES),
                    "completion",
                ),
                inputs=[pc_file, img_file, cls_dd, up_model], outputs=up_plot,
            )
    return app


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--ckpt-dir", default="pretrained")
    args = parser.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio is not installed; use demo.pcreconstructor.PCReconstructor "
              "or demo.app.reconstruct_sample programmatically instead")
        return

    build_app(args.ckpt_dir).launch(server_port=args.port)


if __name__ == "__main__":
    main()
