"""Generate synthetic demo sample assets: demo/samples/<class>/00.{pcd,png}.

The reference ships real ShapeNet crops in demo/samples (one folder per
taxonomy id, pcd + rendered view — /root/reference/demo/app.py:55-101);
ShapeNet data cannot be redistributed here, so these are procedurally
generated partial clouds (deformed-ellipsoid surface, half-space crop like
PCN's camera-visible surface) with a matplotlib-rendered "view" standing in
for the ShapeNet render.

Run: ``python demo/make_samples.py [--out demo/samples]``
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imgadapointr_tpu.datasets.synthetic import _surface_points  # noqa: E402

# the 8 PCN benchmark taxonomies (reference demo gallery classes)
SAMPLE_CLASSES = [
    "02691156", "02933112", "02958343", "03001627",
    "03636649", "04256520", "04379243", "04530566",
]


def write_pcd(path: str, pts: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(
            (
                "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                f"COUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n"
                f"POINTS {len(pts)}\nDATA binary\n"
            ).encode()
        )
        f.write(np.ascontiguousarray(pts, "<f4").tobytes())


def render_view(path: str, pts: np.ndarray) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(2.24, 2.24), dpi=100)
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5, c=pts[:, 2], cmap="viridis")
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def make_sample(seed: int, n_partial: int = 2048):
    """(partial, full) clouds for one demo sample; per-class variation
    comes entirely from the seed (generate() uses 7000 + class index)."""
    rng = np.random.default_rng(seed)
    full = _surface_points(rng, 8192)
    normal = rng.normal(size=3)
    normal /= np.linalg.norm(normal)
    side = full @ normal > np.quantile(full @ normal, 0.5)
    vis = full[side]
    take = rng.integers(0, len(vis), n_partial)
    partial = (vis[take] + rng.normal(0, 0.003, (n_partial, 3))).astype(np.float32)
    return partial, full


def generate(out_dir: str) -> list[str]:
    written = []
    for i, class_id in enumerate(SAMPLE_CLASSES):
        d = os.path.join(out_dir, class_id)
        os.makedirs(d, exist_ok=True)
        partial, full = make_sample(seed=7000 + i)
        write_pcd(os.path.join(d, "00.pcd"), partial)
        render_view(os.path.join(d, "00.png"), full)
        written.append(d)
    return written


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "samples"))
    args = ap.parse_args()
    for d in generate(args.out):
        print("wrote", d)
