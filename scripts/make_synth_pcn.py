"""Generate an on-disk synthetic dataset in the EXACT PCN layout.

Round-4 operational-rehearsal tooling: `cfgs/PCN_models/AdaPoinTr.yaml` (the
paper recipe, 16384 points / bs 16 / 600 epochs) points at
`data/PCN/{subset}/{partial,complete}/...` + `data/PCN/PCN.json`
(cfgs/dataset_configs/PCN.yaml).  The real 50 GB PCN download is absent
here, so this script materialises a few-hundred-model stand-in with the
same tree, file formats (binary .pcd), cloud sizes, and 8 renders per
train model — enough to drive the UNMODIFIED paper config through
main.py train → kill → --resume → validate → --test end to end.

Shapes reuse the procedural surface generator from datasets/synthetic.py
(deformed ellipsoids; partials are half-space crops like PCN's
camera-visible surfaces — one distinct view normal per render).

Usage:
    python scripts/make_synth_pcn.py [--root data/PCN] [--train 240]
        [--val 16] [--test 16] [--n-points 16384] [--with-img]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imgadapointr_tpu.datasets.synthetic import (  # noqa: E402
    _TAXONOMIES,
    _surface_points,
)

N_PARTIAL = 2048


def write_pcd(path, pts):
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


def make_model(rng, n_points):
    gt = _surface_points(rng, n_points)
    renders = []
    for _ in range(8):
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal)
        side = gt @ normal > np.quantile(gt @ normal, 0.5)
        vis = gt[side]
        take = rng.integers(0, len(vis), N_PARTIAL)
        partial = vis[take] + rng.normal(0, 0.005, (N_PARTIAL, 3)).astype(
            np.float32
        )
        renders.append(partial.astype(np.float32))
    return gt, renders


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/PCN")
    ap.add_argument("--train", type=int, default=240)
    ap.add_argument("--val", type=int, default=16)
    ap.add_argument("--test", type=int, default=16)
    ap.add_argument("--n-points", type=int, default=16384)
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--with-img", action="store_true",
                    help="also write 24 render PNGs per model (ImgPCN layout)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    per_tax = {
        "train": -(-args.train // len(_TAXONOMIES)),
        "val": -(-args.val // len(_TAXONOMIES)),
        "test": -(-args.test // len(_TAXONOMIES)),
    }
    cats = []
    n_files = 0
    for ti, tax in enumerate(_TAXONOMIES):
        entry = {"taxonomy_id": tax, "taxonomy_name": f"synth_{tax}",
                 "train": [], "val": [], "test": []}
        for subset in ("train", "val", "test"):
            for i in range(per_tax[subset]):
                m = f"s{ti}_{subset[0]}{i:04d}"
                entry[subset].append(m)
                gt, renders = make_model(rng, args.n_points)
                n_r = 8 if subset == "train" else 1
                for r in range(n_r):
                    write_pcd(
                        os.path.join(args.root, subset, "partial", tax, m,
                                     f"{r:02d}.pcd"),
                        renders[r],
                    )
                    n_files += 1
                write_pcd(
                    os.path.join(args.root, subset, "complete", tax,
                                 f"{m}.pcd"),
                    gt,
                )
                n_files += 1
                if args.with_img:
                    from PIL import Image

                    img = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
                    for r in range(24):
                        p = os.path.join(args.root, "render", subset, tax, m,
                                         f"{r:02d}.png")
                        os.makedirs(os.path.dirname(p), exist_ok=True)
                        Image.fromarray(img).save(p)
                        n_files += 1
        cats.append(entry)
    with open(os.path.join(args.root, "PCN.json"), "w") as f:
        json.dump(cats, f)
    total = sum(len(e[s]) for e in cats for s in ("train", "val", "test"))
    du = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(args.root) for fn in fns
    )
    print(f"wrote {total} models / {n_files} files / {du/1e6:.0f} MB "
          f"under {args.root}")


if __name__ == "__main__":
    main()
