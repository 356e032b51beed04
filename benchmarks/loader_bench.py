"""Input-pipeline throughput benchmark.

Generates a realistic on-disk mini-PCN (binary .pcd partials at 2048 pts,
.pcd gt at 16384 pts, 224x224 .png renders), then measures DataLoader
samples/s end to end (decode + transforms + collate) for the PCN and ImgPCN
shapes at the paper-recipe batch size.

Demand bar: the measured train step is ~164 ms at bs 16 → ~97 samples/s;
the loader must sustain ≥2x that to keep the device fed with prefetch
(VERDICT round 1 #5; the reference used a 16-worker-process torch
DataLoader, tools/builder.py:14-31).

Usage: python benchmarks/loader_bench.py [--models 64] [--workers 16]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_PARTIAL = 2048
N_GT = 16384
TRAIN_STEP_S = 0.116  # measured: bench.py train_step_ms_bs16_16384, round 3
BATCH = 16


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


def build_fixture(root, n_models, with_img):
    from PIL import Image

    rng = np.random.RandomState(0)
    cats = [
        {"taxonomy_id": "02691156", "taxonomy_name": "airplane",
         "train": [f"m{i:04d}" for i in range(n_models)], "val": [], "test": []}
    ]
    with open(os.path.join(root, "PCN.json"), "w") as f:
        json.dump(cats, f)
    img = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    for i in range(n_models):
        m = f"m{i:04d}"
        for r in range(8):
            write_pcd(
                os.path.join(root, "train", "partial", "02691156", m, f"{r:02d}.pcd"),
                rng.randn(N_PARTIAL, 3).astype(np.float32) * 0.3,
            )
        write_pcd(
            os.path.join(root, "train", "complete", "02691156", f"{m}.pcd"),
            rng.randn(N_GT, 3).astype(np.float32) * 0.3,
        )
        if with_img:
            for r in range(24):
                p = os.path.join(root, "render", "train", "02691156", m, f"{r:02d}.png")
                os.makedirs(os.path.dirname(p), exist_ok=True)
                Image.fromarray(img).save(p)


def bench(root, with_img, workers, epochs=3):
    from imgadapointr_tpu.datasets.loader import DataLoader
    from imgadapointr_tpu.datasets.pcn_dataset import PCN, ImgPCN
    from imgadapointr_tpu.utils.config import AttrDict

    cfg = AttrDict(
        {
            "NAME": "ImgPCN" if with_img else "PCN",
            "CATEGORY_FILE_PATH": os.path.join(root, "PCN.json"),
            "N_POINTS": N_GT, "N_RENDERINGS": 8,
            "PARTIAL_POINTS_PATH": os.path.join(root, "%s/partial/%s/%s/%02d.pcd"),
            "COMPLETE_POINTS_PATH": os.path.join(root, "%s/complete/%s/%s.pcd"),
            "CARS": False, "others": {"subset": "train"},
        }
    )
    if with_img:
        cfg["IMG_PATH"] = os.path.join(root, "render/%s/%s/%s/%02d.png")
    ds = ImgPCN(cfg) if with_img else PCN(cfg)
    loader = DataLoader(ds, BATCH, shuffle=True, drop_last=True, num_workers=workers)

    # warm (page cache, lazy imports)
    loader.set_epoch(0)
    for _ in loader:
        pass
    n = 0
    t0 = time.time()
    for e in range(1, epochs + 1):
        loader.set_epoch(e)
        for _, _, batch in loader:
            n += batch["gt"].shape[0]
    dt = time.time() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=int, default=64)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--img", action="store_true", help="ImgPCN variant only")
    args = ap.parse_args()

    demand = BATCH / TRAIN_STEP_S
    root = tempfile.mkdtemp(prefix="loaderbench_")
    try:
        build_fixture(root, args.models, with_img=True)
        for name, with_img in (("PCN", False), ("ImgPCN", True)):
            if args.img and not with_img:
                continue
            sps = bench(root, with_img, args.workers)
            print(
                json.dumps(
                    {
                        "pipeline": name,
                        "samples_per_s": round(sps, 1),
                        "batch": BATCH,
                        "workers": args.workers,
                        "train_demand_samples_per_s": round(demand, 1),
                        "headroom_x": round(sps / demand, 2),
                    }
                )
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
