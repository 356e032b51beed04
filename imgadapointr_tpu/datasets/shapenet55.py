"""ShapeNet-55/34 and KITTI datasets.

The reference snapshot ships only the PCN family (SURVEY §2.5) but its
runner, inference tool and configs reference the ShapeNet-55 8-crop protocol
and the KITTI visualisation path (tools/runner.py:627-665,
tools/inference.py:61-66). These classes provide the data side:

- ``ShapeNet``: file-list dataset over ``<subset>.txt`` lines
  ``<taxonomy>-<model>.npy``; returns the complete cloud only (the partial
  is produced by the crop protocol at test time).
- ``KITTI``: partial car clouds + bounding boxes with NormalizeObjectPose.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.io_module import IO
from ..utils.registry import DATASETS
from .transforms import Compose


@DATASETS.register_module(name="ShapeNet")
class ShapeNet55:
    def __init__(self, config, **kw):
        self.data_root = config.DATA_PATH
        self.pc_path = config.PC_PATH
        self.subset = config.others.subset if "others" in config else config.subset
        self.npoints = int(config.N_POINTS)
        list_file = os.path.join(self.data_root, f"{self.subset}.txt")
        with open(list_file) as f:
            lines = [l.strip() for l in f if l.strip()]
        self.file_list = []
        for line in lines:
            taxonomy_id = line.split("-")[0]
            model_id = line.split("-", 1)[1].split(".")[0]
            self.file_list.append(
                {"taxonomy_id": taxonomy_id, "model_id": model_id, "file_path": line}
            )
        self.transforms = Compose(
            [
                {"callback": "RandomSamplePoints",
                 "parameters": {"n_points": self.npoints}, "objects": ["gt"]},
                {"callback": "ToArray", "objects": ["gt"]},
            ]
        )

    def __len__(self):
        return len(self.file_list)

    def get(self, idx: int, rng: np.random.Generator):
        sample = self.file_list[idx]
        gt = IO.get(os.path.join(self.pc_path, sample["file_path"])).astype(np.float32)
        data = self.transforms({"gt": gt}, rng)
        # crop-protocol models take the gt as both input source and target
        return sample["taxonomy_id"], sample["model_id"], {
            "partial": data["gt"], "gt": data["gt"],
        }


@DATASETS.register_module(name="KITTI")
class KITTI:
    """KITTI cars: partial clouds + bbox pose normalisation, no gt."""

    def __init__(self, config, **kw):
        self.cloud_path = config.CLOUD_PATH
        self.bbox_path = config.BBOX_PATH
        self.category_file = config.CATEGORY_FILE_PATH
        self.n_points = int(config.get("N_POINTS", 2048))
        import json

        with open(self.category_file) as f:
            samples = json.load(f)
        self.file_list = [
            {"model_id": s, "cloud": self.cloud_path % s, "bbox": self.bbox_path % s}
            for s in samples
        ]
        self.transforms = Compose(
            [
                {"callback": "NormalizeObjectPose",
                 "parameters": {"input_keys": {"ptcloud": "partial", "bbox": "bbox"}},
                 "objects": ["partial", "bbox"]},
                {"callback": "UpSamplePoints",
                 "parameters": {"n_points": self.n_points}, "objects": ["partial"]},
                {"callback": "ToArray", "objects": ["partial"]},
            ]
        )

    def __len__(self):
        return len(self.file_list)

    def get(self, idx: int, rng: np.random.Generator):
        sample = self.file_list[idx]
        data = {
            "partial": IO.get(sample["cloud"]).astype(np.float32),
            "bbox": IO.get(sample["bbox"]).astype(np.float32),
        }
        data = self.transforms(data, rng)
        # gt-free: the runner's KITTI branch only visualises
        out = {"partial": data["partial"], "gt": np.zeros((1, 3), np.float32)}
        return "02958343", sample["model_id"], out
