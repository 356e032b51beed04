"""Segmentation-branch AdaPoinTr variants.

- ``SegEncAdaPoinTr`` (reference models/internal/SegEncAdaPoinTr.py:12-130):
  frozen GDANet part-seg features of the encoder centers cross-attended into
  the encoder tokens (``seg_before_enc``); plain AdaPoinTr loss.
- ``ImgEncSegDecAdaPoinTrVariableLoss`` (reference
  models/internal/ImgEncSegDecAdaPoinTrVariableLoss.py:22-146): image fusion
  after the encoder + seg fusion on the decoder queries (``seg_before_dec``,
  train-time applied only to the non-denoise prefix) + variable coarse loss.

GDANet runs frozen: its params are listed in ``ModelSpec.frozen_paths`` so
the optimizer masks both gradients and weight decay; pretrained weights come
from ``--gdanet_w`` (see tools/convert_torch.py for the torch converter).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from ..nn.image_encoders import ResNet18Encoder
from ..ops.normals import estimate_pointcloud_normals
from ..utils.config import AttrDict
from ..utils.envflags import env_flag
from ..utils.registry import MODELS
from .adapointr import AdaPoinTrBase, rebuild_factor
from .build import ModelSpec
from .gdanet import GDANet
from .img_adapointr import variable_alpha
from .losses import adapointr_loss


def _scrambled_normals(coor):
    """Normals exactly as the reference pipeline feeds them to GDANet.

    The reference passes ``norm_plt`` of shape (B, N, 3) into GDANet, whose
    ``local_operator_withnorm`` does ``norm_plt.view(B, -1, N)`` — a MEMORY
    REINTERPRETATION of the (N, 3) buffer as (3, N), not a transpose
    (reference models/internal/pctransformer.py:176-177 +
    models/segmentation/GDANet_util.py:46-47). The net effect is channel-
    scrambled normals. We replicate it faithfully: the activation-parity
    harness (parity/run_parity_gdanet.py) shows bit-level agreement only
    with this quirk, and any converted reference checkpoint's behaviour
    depends on it.
    """
    normals = estimate_pointcloud_normals(coor, 30)
    B, N, _ = normals.shape
    return normals.reshape(B, 3, N).transpose(0, 2, 1)


def _sgcam_commute_active(train: bool) -> bool:
    """TPU train-mode gate for the SGCAM product reassociation (see
    models/gdanet.py SGCAM): mathematically identical (no softmax between
    the matmuls), f32-rounding-level different, so it follows the repo's
    reassociation rule — TPU-only, train-only, opt-out flag, and gated on
    the seg-superset convergence band (benchmarks/RESULTS.md)."""
    return (
        bool(train)
        and jax.default_backend() == "tpu"
        and not env_flag("IMGADAPOINTR_DISABLE_SGCAM_COMMUTE")
    )


def _make_seg_fn(gdanet, train: bool, barrier: bool = False):
    """Frozen-GDANet feature extractor for the fusion stacks.

    ``IMGADAPOINTR_ENABLE_SEG_REMAT=1`` (opt-IN) wraps the whole
    flow-through (normals → GDANet) in ``nn.remat``. Gradient must flow
    THROUGH the frozen net into the coarse cloud (reference
    pctransformer.py:237-278 — no detach); remat replays the forward in
    the backward pass instead of storing residuals. MEASURED NEGATIVE for
    speed on the paper superset step (+9 ms: 151.7 → 160.7 ms with the
    SGCAM commute active, round 5 — the subgraph is gather-bound, so the
    replayed edge-conv gathers cost more than the residual HBM traffic
    they save; benchmarks/RESULTS.md), so it stays off by default; the
    flag remains as a MEMORY lever for configs where the residuals
    matter. The replay runs the same deterministic math: loss values are
    bit-equal and gradients agree to f32 rounding (XLA fuses the remat
    backward differently — measured ~1e-6 relative;
    tests/test_round5_fixes.py).
    """
    fast = _sgcam_commute_active(train)

    def body(mdl, coor, cls):
        feat, _ = mdl(
            coor, _scrambled_normals(coor), cls, deterministic=True,
            fast_sgcam=fast,
        )
        return feat

    remat = train and env_flag("IMGADAPOINTR_ENABLE_SEG_REMAT")
    wrapped = nn.remat(body) if remat else body

    def seg_fn(coor, cls):
        if barrier:
            coor = jax.lax.optimization_barrier(coor)
        feat = wrapped(gdanet, coor, cls)
        if barrier:
            feat = jax.lax.optimization_barrier(feat)
        return feat

    return seg_fn


class SegEncAdaPoinTrModel(nn.Module):
    """seg_before_enc: GDANet features fused into encoder tokens."""

    config: dict

    @nn.compact
    def __call__(self, xyz, cls_vec, train: bool = False, bn_momentum=0.1):
        # frozen usage: normals (k=30, no direction disambiguation) →
        # GDANet 128-d feature tap (reference pctransformer.py:176-179)
        gdanet = GDANet(50, name="segmentator")
        seg_fn = _make_seg_fn(gdanet, train)

        return AdaPoinTrBase(self.config, name="core")(
            xyz, seg_fn=seg_fn, cls_vec=cls_vec, train=train, bn_momentum=bn_momentum
        )


class ImgEncSegDecAdaPoinTrModel(nn.Module):
    """img fusion after encoder + seg fusion on decoder queries.

    Stage outputs pass through optimization barriers: with three sub-networks
    (ResNet, PCTransformer, GDANet) in one graph the XLA TPU fusion search
    goes superlinear (>9 min compiles); partitioning at the small
    stage-boundary tensors keeps each region tractable.
    """

    config: dict

    @nn.compact
    def __call__(self, xyz, img, cls_vec, train: bool = False, bn_momentum=0.1):
        img_feat = ResNet18Encoder(name="im_encoder")(img, train, bn_momentum)
        img_feat = jax.lax.optimization_barrier(img_feat)
        gdanet = GDANet(50, name="segmentator")
        seg_fn = _make_seg_fn(gdanet, train, barrier=True)

        return AdaPoinTrBase(self.config, name="core")(
            xyz, img_feat=img_feat, seg_fn=seg_fn, cls_vec=cls_vec,
            train=train, bn_momentum=bn_momentum,
        )


@MODELS.register_module(name="SegEncAdaPoinTr")
def build_seg_enc(config, **kw):
    cfg = AttrDict(config)
    cfg.use_img_features = False
    cfg.use_seg_features = True
    cfg.seg_before_enc = True
    cfg.seg_before_dec = False
    factor = rebuild_factor(cfg)
    return ModelSpec(
        SegEncAdaPoinTrModel(cfg, **kw),
        lambda ret, gt, epoch: adapointr_loss(ret, gt, factor),
        ("partial", "cls_vec"),
        frozen_paths=("segmentator",),
    )


@MODELS.register_module(name="ImgEncSegDecAdaPoinTrVariableLoss")
def build_img_enc_seg_dec(config, **kw):
    cfg = AttrDict(config)
    cfg.use_img_features = True
    cfg.use_seg_features = True
    cfg.seg_before_enc = False
    cfg.seg_before_dec = True
    factor = rebuild_factor(cfg)
    return ModelSpec(
        ImgEncSegDecAdaPoinTrModel(cfg, **kw),
        lambda ret, gt, epoch: adapointr_loss(
            ret, gt, factor, coarse_alpha=variable_alpha(epoch)
        ),
        ("partial", "img", "cls_vec"),
        frozen_paths=("segmentator",),
    )
