"""AdaPoinTr — flagship completion model (flax.linen).

Reference models/external/AdaPoinTr.py:156-265. Contract:
- train:  ``(pred_coarse, denoised_coarse, denoised_fine, pred_fine)``
- eval:   ``(coarse_point_cloud, rebuild_points)``
Losses live in :mod:`imgadapointr_tpu.models.losses` (pure functions).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.heads import Fold, SimpleRebuildFCLayer
from ..nn.layers import BatchNorm, ConcatDense, dense, leaky_relu
from ..utils.registry import MODELS
from .pctransformer import PCTransformer

FOLD_STEP = 8  # reference AdaPoinTr.py:167


def rebuild_factor(config) -> int:
    """Points rebuilt per query token (reference AdaPoinTr.py:170-180)."""
    if config.decoder_type == "fold":
        return FOLD_STEP**2
    num_points = config.get("num_points", None)
    if num_points is not None:
        assert num_points % config.num_query == 0
        return num_points // config.num_query
    return FOLD_STEP**2


class AdaPoinTrBase(nn.Module):
    """Shared wrapper: PCTransformer core + rebuild head.

    Subclasses/configs toggle the image and segmentation branches; the
    reference expressed these as imperative config mutations inside wrapper
    classes (ImgResNetEncAdaPoinTrVariableLoss.py:27-32 etc.) — here they are
    declarative config fields (``use_img_features``, ``use_seg_features``,
    ``seg_before_enc``, ``seg_before_dec``).
    """

    config: dict

    @nn.compact
    def __call__(
        self,
        xyz,
        img_feat: Optional[jnp.ndarray] = None,
        seg_fn=None,
        cls_vec: Optional[jnp.ndarray] = None,
        train: bool = False,
        bn_momentum=0.1,
    ):
        from ..utils.config import AttrDict

        cfg = AttrDict(self.config)  # flax freezes dict fields; re-wrap
        trans_dim = int(cfg.decoder_config.embed_dim)
        num_query = int(cfg.num_query)
        decoder_type = cfg.decoder_type
        assert decoder_type in ("fold", "fc"), f"unexpected decoder_type {decoder_type}"
        factor = rebuild_factor(cfg)

        q, coarse_point_cloud, denoise_length = PCTransformer(cfg, name="base_model")(
            xyz, img_feat=img_feat, seg_fn=seg_fn, cls_vec=cls_vec,
            train=train, bn_momentum=bn_momentum,
        )
        B, M, C = q.shape

        # increase_dim: pointwise Conv1d(384→1024) + BN + LeakyReLU + Conv1d(1024→1024)
        # (reference AdaPoinTr.py:181-186)
        g = dense(1024, name="increase_dim1")(q)
        g = BatchNorm(1024, name="increase_dim_bn")(
            g, use_running_average=not train, momentum=bn_momentum
        )
        g = dense(1024, name="increase_dim2")(leaky_relu(g))
        global_feature = jnp.max(g, axis=1)  # (B, 1024)

        # reduce_map over virtual concat([global, q, coarse]) — the reference
        # broadcasts global to every token first (AdaPoinTr.py:226-239); here
        # each part contracts separately (same math, fewer FLOPs, no concat
        # buffer).
        rf = ConcatDense(trans_dim, name="reduce_map")(
            global_feature[:, None], q, coarse_point_cloud
        )  # (B, M, trans_dim)

        if decoder_type == "fold":
            relative_xyz = Fold(trans_dim, step=FOLD_STEP, hidden_dim=256, name="decode_head")(
                rf.reshape(B * M, trans_dim),
                use_running_average=not train, bn_momentum=bn_momentum,
            )  # (B·M, S, 3)
            relative_xyz = relative_xyz.reshape(B, M, factor, 3)
        else:
            relative_xyz = SimpleRebuildFCLayer(
                trans_dim * 2, step=factor, name="decode_head"
            )(rf, deterministic=not train)  # (B, M, S, 3)

        rebuild_points = relative_xyz + coarse_point_cloud[:, :, None]  # (B, M, S, 3)

        if train:
            assert denoise_length > 0
            L = denoise_length
            pred_fine = rebuild_points[:, :-L].reshape(B, -1, 3)
            pred_coarse = coarse_point_cloud[:, :-L]
            denoised_fine = rebuild_points[:, -L:].reshape(B, -1, 3)
            denoised_coarse = coarse_point_cloud[:, -L:]
            assert pred_fine.shape[1] == num_query * factor
            assert pred_coarse.shape[1] == num_query
            return pred_coarse, denoised_coarse, denoised_fine, pred_fine

        assert denoise_length == 0
        rebuild_points = rebuild_points.reshape(B, -1, 3)
        assert rebuild_points.shape[1] == num_query * factor
        return coarse_point_cloud, rebuild_points


@MODELS.register_module(name="AdaPoinTr")
def build_adapointr(config, **kwargs):
    from .build import ModelSpec
    from .losses import adapointr_loss

    factor = rebuild_factor(config)
    return ModelSpec(
        module=AdaPoinTrBase(config, **kwargs),
        loss_fn=lambda ret, gt, epoch: adapointr_loss(ret, gt, factor),
        inputs=("partial",),
    )
