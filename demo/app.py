"""Gradio demo app (reference demo/app.py:55-101).

Serves the sample gallery with a model picker and plotly 3D scatter of the
input/completed clouds. Gradio is optional in this image — the app degrades
to a CLI message when it is absent.

Run: ``python demo/app.py --config <cfg> --ckpt <ckpt> [--port 8080]``
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo.pcreconstructor import PCReconstructor  # noqa: E402
from imgadapointr_tpu.datasets.pcn_dataset import CLASSES  # noqa: E402


def make_figure(points: np.ndarray, title: str):
    import plotly.graph_objects as go

    return go.Figure(
        data=[
            go.Scatter3d(
                x=points[:, 0], y=points[:, 1], z=points[:, 2],
                mode="markers", marker=dict(size=1.5),
            )
        ],
        layout=dict(title=title),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default="")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--samples", default="demo/samples")
    args = parser.parse_args()

    rec = PCReconstructor(args.config, args.ckpt)

    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; use demo.pcreconstructor.PCReconstructor "
              "programmatically instead")
        return

    def reconstruct(pc_file, img_file, class_id):
        fine = rec.predict(pc_file, img_file, class_id, CLASSES)
        return make_figure(fine, "completion")

    app = gr.Interface(
        fn=reconstruct,
        inputs=[
            gr.File(label="partial point cloud (.pcd/.npy/.ply)"),
            gr.Image(label="rendered view", type="filepath"),
            gr.Dropdown(sorted(CLASSES), label="ShapeNet class"),
        ],
        outputs=gr.Plot(),
        title="ImgAdaPoinTr point-cloud completion",
    )
    app.launch(server_port=args.port)


if __name__ == "__main__":
    main()
