"""Model zoo — registry-driven, mirroring the reference's registered set
(SURVEY.md §2.4): AdaPoinTr, ImgResNetEncAdaPoinTrVariableLoss,
SegEncAdaPoinTr, ImgEncSegDecAdaPoinTrVariableLoss, FoldingNet, PCN, TopNet,
GRNet, SnowFlakeNet (+ GDANet submodule)."""

from ..utils.registry import MODELS, build_model_from_cfg
from . import adapointr  # noqa: F401  (registers AdaPoinTr)
from . import baselines  # noqa: F401  (registers FoldingNet, PCN, TopNet)
from . import img_adapointr  # noqa: F401  (ImgResNetEncAdaPoinTrVariableLoss, AdaPoinTrVariableLoss)
from . import seg_adapointr  # noqa: F401  (SegEncAdaPoinTr, ImgEncSegDecAdaPoinTrVariableLoss)
from . import snowflakenet  # noqa: F401  (SnowFlakeNet)
from . import grnet  # noqa: F401  (GRNet)
from .adapointr import AdaPoinTrBase, rebuild_factor
from .losses import adapointr_loss, cycle_alpha, denoise_targets
from .pctransformer import PCTransformer

__all__ = [
    "MODELS",
    "build_model_from_cfg",
    "AdaPoinTrBase",
    "rebuild_factor",
    "adapointr_loss",
    "cycle_alpha",
    "denoise_targets",
    "PCTransformer",
]
