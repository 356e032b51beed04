"""GRNet — gridding residual network (flax.linen, NDHWC).

Reference models/external/GRNet.py:45-185: Gridding(64³) → 3D U-Net →
GriddingReverse → random point sampling → CubicFeatureSampling at 3 scales →
MLP → 8× point offsets. Loss = CD-L2 (+ GriddingLoss whose lambda the
reference hardcodes to 0, GRNet.py:51).

Torch layout notes: Conv3d(k=4, p=2) grows 64→65 before each 2× maxpool
(65→32 floor), reproduced with explicit padding; ConvTranspose3d(k4 s2 p1)
≡ flax ConvTranspose(k4 s2 'SAME').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import BatchNorm, dense, leaky_relu
from ..ops import chamfer_l2
from ..ops.gridding import (
    cubic_feature_sampling,
    gridding,
    gridding_loss,
    gridding_reverse,
)
from ..utils.registry import MODELS
from .build import ModelSpec


def random_point_sampling(key, pred_cloud, partial_cloud, n_points):
    """Random subset of cat(partial, pred), zero rows excluded
    (reference GRNet.py:21-42). Fixed shape: zero rows get -inf score."""
    cloud = jnp.concatenate([partial_cloud, pred_cloud], axis=1)
    nonzero = jnp.sum(jnp.abs(cloud), axis=-1) > 0
    scores = jax.random.uniform(key, cloud.shape[:2])
    scores = jnp.where(nonzero, scores, -1e9)
    _, idx = jax.lax.top_k(scores, n_points)
    return jnp.take_along_axis(cloud, idx[..., None], axis=1)


class _ConvBlock3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=False, bn_momentum=0.1):
        # Conv3d(k=4, padding=2): D → D+1, then 2× maxpool (floor)
        x = nn.Conv(self.features, (4, 4, 4), padding=2, name="conv")(x)
        x = BatchNorm(self.features, name="bn")(x, not train, bn_momentum)
        x = leaky_relu(x)
        return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


class _DeconvBlock3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=False, bn_momentum=0.1):
        x = nn.ConvTranspose(
            self.features, (4, 4, 4), strides=(2, 2, 2), padding="SAME",
            use_bias=False, name="dconv",
        )(x)
        x = BatchNorm(self.features, name="bn")(x, not train, bn_momentum)
        return nn.relu(x)


class GRNetModel(nn.Module):
    config: dict

    @nn.compact
    def __call__(self, xyz, train: bool = False, bn_momentum=0.1):
        cfg = self.config
        num_pred = int(cfg["num_pred"])
        n_sparse = num_pred // 8
        B = xyz.shape[0]

        partial = xyz * 0.5  # avoid gridding overflow (reference GRNet.py:140)
        g64 = gridding(partial, 64)[..., None]  # (B, 64, 64, 64, 1)
        f32 = _ConvBlock3D(32, name="conv1")(g64, train, bn_momentum)
        f16 = _ConvBlock3D(64, name="conv2")(f32, train, bn_momentum)
        f8 = _ConvBlock3D(128, name="conv3")(f16, train, bn_momentum)
        f4 = _ConvBlock3D(256, name="conv4")(f8, train, bn_momentum)

        flat = f4.reshape(B, -1)  # (B, 4·4·4·256 = 16384)
        h = nn.relu(dense(2048, name="fc5")(flat))
        h = nn.relu(dense(16384, name="fc6")(h))
        r4 = h.reshape(B, 4, 4, 4, 256) + f4
        r8 = _DeconvBlock3D(128, name="dconv7")(r4, train, bn_momentum) + f8
        r16 = _DeconvBlock3D(64, name="dconv8")(r8, train, bn_momentum) + f16
        r32 = _DeconvBlock3D(32, name="dconv9")(r16, train, bn_momentum) + f32
        r64 = _DeconvBlock3D(1, name="dconv10")(r32, train, bn_momentum) + g64

        sparse = gridding_reverse(r64[..., 0], 64)  # (B, 64³, 3)
        # The reference's RandomPointSampling stays RANDOM at eval
        # (models/external/GRNet.py:21-42 never seeds), so its eval tables
        # jitter run to run. Default here is `eval_sampling: fixed`
        # (PRNGKey(0) — reproducible metrics); set `eval_sampling: random`
        # in the model config (and pass a 'noise' rng to apply) for
        # reference-faithful eval randomness. Train-mode sampling is
        # random either way.
        eval_random = (
            str(cfg.get("eval_sampling", "fixed")) == "random"
            and self.has_rng("noise")
        )
        key = (
            self.make_rng("noise")
            if (train or eval_random)
            else jax.random.PRNGKey(0)  # deterministic eval sampling
        )
        sparse = random_point_sampling(key, sparse, partial, n_sparse)

        pf32 = cubic_feature_sampling(sparse, r32).reshape(B, n_sparse, -1)  # 8·32
        pf16 = cubic_feature_sampling(sparse, r16).reshape(B, n_sparse, -1)  # 8·64
        pf8 = cubic_feature_sampling(sparse, r8).reshape(B, n_sparse, -1)  # 8·128
        pf = jnp.concatenate([pf32, pf16, pf8], axis=-1)  # (B, n, 1792)
        pf = nn.relu(dense(1792, name="fc11")(pf))
        pf = nn.relu(dense(448, name="fc12")(pf))
        pf = nn.relu(dense(112, name="fc13")(pf))
        offsets = dense(24, name="fc14")(pf).reshape(B, num_pred, 3)
        dense_cloud = (
            jnp.repeat(sparse, 8, axis=1).reshape(B, num_pred, 3) + offsets
        )
        return sparse * 2.0, dense_cloud * 2.0


def grnet_loss_fn(config):
    scales = [int(config.get("gridding_loss_scales", 128))]
    alphas = [float(config.get("gridding_loss_alphas", 0.1))]
    loss_lambda = 0.0  # reference GRNet.py:51 hardcodes the gridding term off

    def loss(ret, gt, epoch):
        coarse = chamfer_l2(ret[0], gt)
        if loss_lambda:
            coarse = coarse + loss_lambda * gridding_loss(ret[0], gt, scales, alphas)
        return coarse, chamfer_l2(ret[1], gt)

    return loss


@MODELS.register_module(name="GRNet")
def build_grnet(config, **kw):
    return ModelSpec(
        GRNetModel(config, **kw), grnet_loss_fn(config), ("partial",)
    )
