"""ImgAdaPoinTr — image-branch AdaPoinTr with variable coarse loss.

Reference models/internal/ImgResNetEncAdaPoinTrVariableLoss.py:24-145
(registry name ``ImgResNetEncAdaPoinTrVariableLoss``, a.k.a. ImgAdaPoinTr,
PCN CD-L1 6.347): the shared PCTransformer with ``use_img_features=True``
(ResNet18 patch features cross-attended into the encoder tokens) plus the
CycleLR-scheduled coarse-loss alpha.

The reference mutates its config imperatively inside the wrapper class
(:27-32); here the registry factory sets the flags declaratively.
"""

from __future__ import annotations

from flax import linen as nn

from ..nn.image_encoders import ResNet18Encoder
from ..utils.config import AttrDict
from ..utils.registry import MODELS
from .adapointr import AdaPoinTrBase, rebuild_factor
from .build import ModelSpec
from .losses import adapointr_loss, cycle_alpha

ALPHA_STEP_SIZE = 5  # reference :36; the alpha table is shifted by this
# (alpha_loss[epoch] = CycleLR.get_lr(epoch + STEP_SIZE), reference :73)


def variable_alpha(epoch):
    return cycle_alpha(epoch + ALPHA_STEP_SIZE)


class ImgAdaPoinTrModel(nn.Module):
    """ResNet18 image features + AdaPoinTr core."""

    config: dict

    @nn.compact
    def __call__(self, xyz, img, train: bool = False, bn_momentum=0.1):
        img_feat = ResNet18Encoder(name="im_encoder")(img, train, bn_momentum)
        return AdaPoinTrBase(self.config, name="core")(
            xyz, img_feat=img_feat, train=train, bn_momentum=bn_momentum
        )


def _img_config(config) -> AttrDict:
    cfg = AttrDict(config)
    cfg.use_img_features = True
    cfg.use_seg_features = False
    cfg.seg_before_enc = False
    cfg.seg_before_dec = False
    return cfg


@MODELS.register_module(name="ImgResNetEncAdaPoinTrVariableLoss")
def build_img_adapointr(config, **kw):
    cfg = _img_config(config)
    factor = rebuild_factor(cfg)
    return ModelSpec(
        ImgAdaPoinTrModel(cfg, **kw),
        lambda ret, gt, epoch: adapointr_loss(
            ret, gt, factor, coarse_alpha=variable_alpha(epoch)
        ),
        ("partial", "img"),
    )


@MODELS.register_module(name="AdaPoinTrVariableLoss")
def build_adapointr_variable_loss(config, **kw):
    """Point-only ablation with the variable loss (README 6.482)."""
    cfg = AttrDict(config)
    factor = rebuild_factor(cfg)
    return ModelSpec(
        AdaPoinTrBase(cfg, **kw),
        lambda ret, gt, epoch: adapointr_loss(
            ret, gt, factor, coarse_alpha=variable_alpha(epoch)
        ),
        ("partial",),
    )
