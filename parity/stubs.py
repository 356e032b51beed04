"""CPU-torch stand-ins for the reference's CUDA extensions and absent
third-party packages, so the reference models (/root/reference, read-only)
can be instantiated and run on CPU for activation-level parity checks.

These stubs implement the documented semantics of:
- ``pointnet2_ops.pointnet2_utils`` (furthest_point_sample / gather_operation
  / three_nn / three_interpolate) — matching the CUDA kernels: FPS seeded at
  index 0 with a running min-distance cache; three_nn returns euclidean
  distances.
- ``extensions.chamfer_dist`` (L1/L2/PM variants; dense CPU implementation).
- ``extensions.gridding`` / ``gridding_loss`` / ``cubic_feature_sampling``
  (import-only stubs; GRNet parity handled separately).
- ``timm.models.layers`` (DropPath, trunc_normal_).
- ``torchvision.models`` (resnet18/resnet50 with torchvision's exact module
  structure, so ``list(model.children())[:-3]`` slicing behaves identically).
- ``pytorch3d.ops.points_normals.estimate_pointcloud_normals`` (k-NN PCA
  smallest-eigenvector, no disambiguation).
- ``easydict.EasyDict``.

Install with :func:`install_stubs` BEFORE importing any reference module.
Also monkeypatches ``Tensor.cuda``/``Module.cuda`` to no-ops so reference
code paths with hardcoded ``.cuda()`` (e.g. Fold.folding_seed) run on CPU.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------- pointnet2
def furthest_point_sample(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """(B, N, 3) -> (B, npoint) int32, CUDA-kernel semantics: start at index
    0, running min-distance cache, argmax next."""
    B, N, _ = xyz.shape
    xyz = xyz.float()
    idxs = torch.zeros(B, npoint, dtype=torch.int64)
    mindist = torch.full((B, N), 1e10)
    last = torch.zeros(B, dtype=torch.int64)
    for i in range(1, npoint):
        lastp = xyz[torch.arange(B), last]  # (B, 3)
        d = ((xyz - lastp[:, None]) ** 2).sum(-1)
        mindist = torch.minimum(mindist, d)
        last = mindist.argmax(-1)
        idxs[:, i] = last
    return idxs.int()


def gather_operation(features: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """(B, C, N), (B, S) int -> (B, C, S)."""
    B = features.shape[0]
    return torch.stack([features[b][:, idx[b].long()] for b in range(B)])


def three_nn(unknown: torch.Tensor, known: torch.Tensor):
    """(B, n, 3), (B, m, 3) -> euclidean dists (B, n, 3), idx (B, n, 3)."""
    d = torch.cdist(unknown.float(), known.float())  # (B, n, m)
    dist, idx = torch.topk(d, 3, dim=-1, largest=False)
    return dist, idx.int()


def three_interpolate(feats: torch.Tensor, idx: torch.Tensor, weight: torch.Tensor):
    """(B, C, m), (B, n, 3), (B, n, 3) -> (B, C, n)."""
    B, C, _ = feats.shape
    n = idx.shape[1]
    out = torch.zeros(B, C, n, dtype=feats.dtype)
    for b in range(B):
        nbr = feats[b][:, idx[b].long()]  # (C, n, 3)
        out[b] = (nbr * weight[b][None]).sum(-1)
    return out


def grouping_operation(features: torch.Tensor, idx: torch.Tensor):
    """(B, C, N), (B, S, K) int -> (B, C, S, K)."""
    B = features.shape[0]
    return torch.stack(
        [features[b][:, idx[b].long().reshape(-1)].reshape(features.shape[1], *idx.shape[1:])
         for b in range(B)]
    )


def ball_query(radius: float, nsample: int, xyz: torch.Tensor, new_xyz: torch.Tensor):
    """pointnet2 CUDA semantics: first nsample in-radius points in INDEX
    order; short lists repeat the first in-radius point; empty keep 0."""
    B, N, _ = xyz.shape
    d2 = torch.cdist(new_xyz.float(), xyz.float()) ** 2
    in_ball = d2 <= radius * radius
    key = torch.where(in_ball, torch.arange(N).view(1, 1, N).expand_as(in_ball),
                      torch.full_like(in_ball, N, dtype=torch.long))
    idx, _ = torch.topk(-key, min(nsample, N), dim=-1)
    idx = -idx
    valid = idx < N
    first = torch.where(valid[..., :1], idx[..., :1], torch.zeros_like(idx[..., :1]))
    return torch.where(valid, idx, first).int()


# ------------------------------------------------------------ chamfer (CPU)
def _nn_sqdist(x, y):
    # input dtype (fp64 under --double) and diff-form distances: the f32
    # cast + matmul-form cdist previously made the STUB the least precise
    # link in the fp64 gradient-parity chain (~1e-6 rel grad noise)
    d = torch.cdist(x, y, compute_mode="donot_use_mm_for_euclid_dist") ** 2
    return d.min(-1)[0], d.transpose(1, 2).min(-1)[0]


class ChamferDistanceL2(nn.Module):
    def __init__(self, ignore_zeros=False):
        super().__init__()
        self.ignore_zeros = ignore_zeros

    def _filter(self, xyz1, xyz2):
        if self.ignore_zeros and xyz1.shape[0] == 1:
            m1 = xyz1[0].abs().sum(-1) != 0
            m2 = xyz2[0].abs().sum(-1) != 0
            return xyz1[:, m1], xyz2[:, m2]
        return xyz1, xyz2

    def forward(self, xyz1, xyz2):
        xyz1, xyz2 = self._filter(xyz1, xyz2)
        d1, d2 = _nn_sqdist(xyz1, xyz2)
        return d1.mean() + d2.mean()


class ChamferDistanceL2_split(ChamferDistanceL2):
    def forward(self, xyz1, xyz2):
        xyz1, xyz2 = self._filter(xyz1, xyz2)
        d1, d2 = _nn_sqdist(xyz1, xyz2)
        return d1.mean(), d2.mean()


class ChamferDistanceL1(ChamferDistanceL2):
    def forward(self, xyz1, xyz2):
        xyz1, xyz2 = self._filter(xyz1, xyz2)
        d1, d2 = _nn_sqdist(xyz1, xyz2)
        return (d1.clamp(min=1e-24).sqrt().mean() + d2.clamp(min=1e-24).sqrt().mean()) / 2

class ChamferDistanceL1_PM(ChamferDistanceL2):
    def forward(self, xyz1, xyz2):
        xyz1, xyz2 = self._filter(xyz1, xyz2)
        d1, _ = _nn_sqdist(xyz1, xyz2)
        return d1.clamp(min=1e-24).sqrt().mean()


# ------------------------------------------------------- resnet (torchvision)
class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    """torchvision.models.ResNet layout: children() order must be
    [conv1, bn1, relu, maxpool, layer1..layer4, avgpool, fc]."""

    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(pretrained=False, **kw):
    assert not pretrained, "no pretrained weights in the parity harness"
    return _ResNet(_BasicBlock, [2, 2, 2, 2])


def resnet50(pretrained=False, **kw):
    assert not pretrained, "no pretrained weights in the parity harness"
    return _ResNet(_Bottleneck, [3, 4, 6, 3])


# ------------------------------------------------------------- pytorch3d
def estimate_pointcloud_normals(points, neighborhood_size=50,
                                disambiguate_directions=True, **kw):
    """(B, N, 3) -> (B, N, 3) unit normals: smallest-eigenvalue eigenvector
    of the kNN-neighborhood covariance (pytorch3d semantics, kNN includes
    the point itself; no direction disambiguation when flag is False)."""
    assert not disambiguate_directions, "harness supports the reference's usage only"
    B, N, _ = points.shape
    d = torch.cdist(points, points)
    _, idx = torch.topk(d, neighborhood_size, dim=-1, largest=False)
    normals = torch.zeros_like(points)
    for b in range(B):
        nbr = points[b][idx[b]]  # (N, k, 3)
        centered = nbr - nbr.mean(dim=1, keepdim=True)
        cov = centered.transpose(1, 2) @ centered / neighborhood_size
        _, vecs = torch.linalg.eigh(cov)  # ascending eigenvalues
        normals[b] = vecs[..., 0]
    return normals


# ------------------------------------------------------------- installation
def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    # torch .cuda() no-ops (Fold.folding_seed, misc.seprate_point_cloud, ...)
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    # timm
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = float(drop_prob or 0.0)

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            return x * x.new_empty(shape).bernoulli_(keep) / keep

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    def create_model(name, pretrained=False, **kw):
        raise NotImplementedError(f"timm model {name} not available in parity harness")

    timm = _module("timm", create_model=create_model)
    timm.models = _module("timm.models")
    timm.models.layers = _module(
        "timm.models.layers", DropPath=DropPath, trunc_normal_=trunc_normal_
    )

    class CosineLRScheduler:  # import-only (reference tools/builder.py:6)
        def __init__(self, *a, **k):
            raise NotImplementedError("CosLR not exercised by the parity harness")

    timm.scheduler = _module("timm.scheduler", CosineLRScheduler=CosineLRScheduler)

    # open3d: import-only (reference utils/io_module.py:3 — pulled in via
    # `from datasets import ...` when loading the reference tools/builder)
    o3d = _module("open3d")
    o3d.io = _module("open3d.io")
    o3d.geometry = _module("open3d.geometry")
    o3d.utility = _module("open3d.utility")

    # transforms3d: real mirror math (reference datasets/data_transforms.py:
    # 95-100 uses zooms.zfdir2mat for the RandomMirrorPoints reflections)
    def zfdir2mat(factor, direction=None):
        if direction is None:
            return np.eye(3) * 1.0
        d = np.asarray(direction, dtype=float)
        d = d / np.linalg.norm(d)
        return np.eye(3) - (1.0 - factor) * np.outer(d, d)

    t3d = _module("transforms3d")
    t3d.zooms = _module("transforms3d.zooms", zfdir2mat=zfdir2mat)

    # torchvision
    tv = _module("torchvision")
    tv.transforms = _module("torchvision.transforms")
    tv.models = _module("torchvision.models", resnet18=resnet18, resnet50=resnet50)

    # pointnet2_ops
    pn2 = _module("pointnet2_ops")
    pn2.pointnet2_utils = _module(
        "pointnet2_ops.pointnet2_utils",
        furthest_point_sample=furthest_point_sample,
        gather_operation=gather_operation,
        three_nn=three_nn,
        three_interpolate=three_interpolate,
        grouping_operation=grouping_operation,
        ball_query=ball_query,
    )

    # pytorch3d
    p3d = _module("pytorch3d")
    p3d.ops = _module("pytorch3d.ops")
    p3d.ops.points_normals = _module(
        "pytorch3d.ops.points_normals",
        estimate_pointcloud_normals=estimate_pointcloud_normals,
    )
    sys.modules["pytorch3d.ops"].points_normals = p3d.ops.points_normals

    # easydict
    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in {**(d or {}), **kw}.items():
                self[k] = EasyDict(v) if isinstance(v, dict) else v

        __getattr__ = dict.__getitem__

        def __setattr__(self, k, v):
            self[k] = v

    _module("easydict", EasyDict=EasyDict)

    # extensions.* (CUDA) — chamfer fully functional; grid ops import-only
    ext = _module("extensions")
    ext.chamfer_dist = _module(
        "extensions.chamfer_dist",
        ChamferDistanceL1=ChamferDistanceL1,
        ChamferDistanceL2=ChamferDistanceL2,
        ChamferDistanceL2_split=ChamferDistanceL2_split,
        ChamferDistanceL1_PM=ChamferDistanceL1_PM,
    )

    class _NotBuilt(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):
            raise NotImplementedError("CUDA grid op stub — GRNet parity is separate")

    ext.gridding = _module(
        "extensions.gridding", Gridding=_NotBuilt, GriddingReverse=_NotBuilt
    )
    ext.gridding_loss = _module("extensions.gridding_loss", GriddingLoss=_NotBuilt)
    ext.cubic_feature_sampling = _module(
        "extensions.cubic_feature_sampling", CubicFeatureSampling=_NotBuilt
    )
    ext.emd = _module("extensions.emd")
    sys.modules["extensions.emd"].emd_module = _module("extensions.emd.emd_module")
