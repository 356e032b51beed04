"""Host-side (numpy) data transform pipeline.

Reference datasets/data_transforms.py:12-134. Transforms run in the input
pipeline on CPU and feed fixed-shape numpy batches to the device; each takes
an explicit ``np.random.Generator`` (the reference used global numpy RNG).
``Compose`` mirrors the reference's callback-table semantics, including the
single shared uniform draw for RandomMirrorPoints across partial/gt.
"""

from __future__ import annotations

import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transformers = []
        for tr in transforms:
            cls = _TRANSFORMS[tr["callback"]]
            self.transformers.append(
                {
                    "callback": cls(tr.get("parameters")),
                    "objects": tr["objects"],
                }
            )

    def __call__(self, data: dict, rng: np.random.Generator) -> dict:
        for tr in self.transformers:
            transform = tr["callback"]
            objects = tr["objects"]
            rnd_value = rng.uniform(0, 1)
            if isinstance(transform, NormalizeObjectPose):
                data = transform(data)
                continue
            for k in list(data.keys()):
                if k in objects:
                    if isinstance(transform, RandomMirrorPoints):
                        data[k] = transform(data[k], rnd_value)
                    elif isinstance(transform, (RandomSamplePoints, UpSamplePoints)):
                        data[k] = transform(data[k], rng)
                    else:
                        data[k] = transform(data[k])
        return data


class ToArray:
    """Terminal transform: contiguous float32 (replaces the reference's
    ToTensor; images stay HWC — the flax image encoders are channels-last)."""

    def __init__(self, parameters=None):
        pass

    def __call__(self, arr):
        return np.ascontiguousarray(arr, dtype=np.float32)


class RandomSamplePoints:
    """Random permutation, keep n, zero-pad if short (reference :55-67)."""

    def __init__(self, parameters):
        self.n_points = parameters["n_points"]

    def __call__(self, ptcloud, rng: np.random.Generator):
        choice = rng.permutation(ptcloud.shape[0])
        ptcloud = ptcloud[choice[: self.n_points]]
        if ptcloud.shape[0] < self.n_points:
            zeros = np.zeros((self.n_points - ptcloud.shape[0], 3), ptcloud.dtype)
            ptcloud = np.concatenate([ptcloud, zeros])
        return ptcloud


class UpSamplePoints:
    """Tile + random-subset upsample to n points (reference :69-87)."""

    def __init__(self, parameters):
        self.n_points = parameters["n_points"]

    def __call__(self, ptcloud, rng: np.random.Generator):
        curr = ptcloud.shape[0]
        need = self.n_points - curr
        if need < 0:
            return ptcloud[rng.permutation(self.n_points)]
        while curr <= need:
            ptcloud = np.tile(ptcloud, (2, 1))
            need -= curr
            curr *= 2
        choice = rng.permutation(need)
        return np.concatenate([ptcloud, ptcloud[choice]])


class RandomMirrorPoints:
    """x / z / xz reflection chosen by one shared uniform draw (reference
    :89-106; the same draw is applied to partial and gt)."""

    def __init__(self, parameters=None):
        pass

    def __call__(self, ptcloud, rnd_value):
        mat = np.eye(3, dtype=np.float32)
        mx = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
        mz = np.diag([1.0, 1.0, -1.0]).astype(np.float32)
        if rnd_value <= 0.25:
            mat = mx @ mz @ mat
        elif rnd_value <= 0.5:
            mat = mx @ mat
        elif rnd_value <= 0.75:
            mat = mz @ mat
        out = ptcloud.copy()
        out[:, :3] = ptcloud[:, :3] @ mat.T
        return out


class NormalizeObjectPose:
    """KITTI bbox-frame normalisation (reference :108-134)."""

    def __init__(self, parameters):
        input_keys = parameters["input_keys"]
        self.ptcloud_key = input_keys["ptcloud"]
        self.bbox_key = input_keys["bbox"]

    def __call__(self, data):
        ptcloud = data[self.ptcloud_key]
        bbox = data[self.bbox_key]
        center = (bbox.min(0) + bbox.max(0)) / 2
        bbox = bbox - center
        yaw = np.arctan2(bbox[3, 1] - bbox[0, 1], bbox[3, 0] - bbox[0, 0])
        rotation = np.array(
            [
                [np.cos(yaw), -np.sin(yaw), 0],
                [np.sin(yaw), np.cos(yaw), 0],
                [0, 0, 1],
            ]
        )
        bbox = bbox @ rotation
        scale = bbox[3, 0] - bbox[0, 0]
        bbox = bbox / scale
        ptcloud = (ptcloud - center) @ rotation / scale
        ptcloud = ptcloud @ np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)
        data[self.ptcloud_key] = ptcloud.astype(np.float32)
        data[self.bbox_key] = bbox.astype(np.float32)
        return data


_TRANSFORMS = {
    "ToTensor": ToArray,  # reference name kept for config compatibility
    "ToArray": ToArray,
    "RandomSamplePoints": RandomSamplePoints,
    "UpSamplePoints": UpSamplePoints,
    "RandomMirrorPoints": RandomMirrorPoints,
    "NormalizeObjectPose": NormalizeObjectPose,
}
