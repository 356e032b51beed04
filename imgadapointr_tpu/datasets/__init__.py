"""Datasets: registry-driven PCN family + synthetic, host-side transforms,
sharded batched loader."""

from ..utils.registry import DATASETS, build_dataset_from_cfg
from . import pcn_dataset  # noqa: F401  (registers PCN, PCNv2, ImgPCN, SegImgPCN)
from . import synthetic  # noqa: F401  (registers SyntheticPCN)
from . import shapenet55  # noqa: F401  (registers ShapeNet, KITTI)
from .loader import DataLoader
from .transforms import Compose

__all__ = ["DATASETS", "build_dataset_from_cfg", "DataLoader", "Compose"]
