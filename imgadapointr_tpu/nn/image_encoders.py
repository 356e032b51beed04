"""Image encoders (flax.linen, channels-last NHWC).

Reference models/image_encoders.py:16-49. All reference encoders are built
with ``pretrained=False`` — random init — so structural parity is exact:

- ``ResNet18Encoder``: torchvision resnet18 cut at children[:-3] (through
  layer3) → (B, 256, 14, 14) for 224² input, flattened to (B, 256, 196):
  the 256 *channels* become fusion tokens with 196-dim spatial features.
- ``ResNet50Encoder``: full trunk + global pool → (B, 2048) → (B, 8, 256).
- ``ConvNextEncoder``: ConvNeXt-small trunk. NB the reference's ConvNext
  wrapper is broken (reshape(B, 98, -1) on a (B, 768, H, W) map does not
  divide); it is referenced only by stale unregistered configs. Here it
  emits (B, H·W, C) spatial tokens.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False, bn_momentum=0.1):
        ura = not train
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv1")(x)
        y = BatchNorm(self.features, name="bn1")(y, ura, bn_momentum)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = BatchNorm(self.features, name="bn2")(y, ura, bn_momentum)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.stride, use_bias=False, name="down_conv"
            )(x)
            residual = BatchNorm(self.features, name="down_bn")(residual, ura, bn_momentum)
        return nn.relu(y + residual)


class _Bottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False, bn_momentum=0.1):
        ura = not train
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = BatchNorm(self.features, name="bn1")(y, ura, bn_momentum)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv2")(y)
        y = BatchNorm(self.features, name="bn2")(y, ura, bn_momentum)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(self.features * 4, name="bn3")(y, ura, bn_momentum)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=self.stride, use_bias=False, name="down_conv"
            )(x)
            residual = BatchNorm(self.features * 4, name="down_bn")(residual, ura, bn_momentum)
        return nn.relu(y + residual)


class _ResNetTrunk(nn.Module):
    block: type
    stage_sizes: Sequence[int]
    stage_features: Sequence[int]
    num_stages: int  # how many stages to keep (resnet18 image branch keeps 3)

    @nn.compact
    def __call__(self, x, train=False, bn_momentum=0.1):
        ura = not train
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="stem_conv")(x)
        x = BatchNorm(64, name="stem_bn")(x, ura, bn_momentum)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s in range(self.num_stages):
            for b in range(self.stage_sizes[s]):
                stride = 2 if (s > 0 and b == 0) else 1
                x = self.block(
                    self.stage_features[s], stride=stride, name=f"layer{s+1}_{b}"
                )(x, train, bn_momentum)
        return x


class ResNet18Encoder(nn.Module):
    """(B, 224, 224, 3) → (B, 256, 196) fusion tokens."""

    @nn.compact
    def __call__(self, img, train=False, bn_momentum=0.1):
        x = _ResNetTrunk(
            _BasicBlock, (2, 2, 2, 2), (64, 128, 256, 512), num_stages=3, name="trunk"
        )(img, train, bn_momentum)  # (B, 14, 14, 256)
        B, H, W, C = x.shape
        # channels become tokens (reference image_encoders.py:35: view(B, 256, -1))
        return x.reshape(B, H * W, C).transpose(0, 2, 1)  # (B, 256, H·W)


class ResNet50Encoder(nn.Module):
    """(B, 224, 224, 3) → (B, 8, 256) (reference image_encoders.py:40-49)."""

    @nn.compact
    def __call__(self, img, train=False, bn_momentum=0.1):
        x = _ResNetTrunk(
            _Bottleneck, (3, 4, 6, 3), (64, 128, 256, 512), num_stages=4, name="trunk"
        )(img, train, bn_momentum)  # (B, 7, 7, 2048)
        x = jnp.mean(x, axis=(1, 2))  # global avg pool → (B, 2048)
        return x.reshape(x.shape[0], 8, 256)


class _ConvNextBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = nn.Dense(4 * self.dim, name="pw1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pw2")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma * y


class ConvNextEncoder(nn.Module):
    """ConvNeXt-small trunk → (B, H·W, 768) spatial tokens."""

    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (96, 192, 384, 768)

    @nn.compact
    def __call__(self, img, train=False, bn_momentum=0.1):
        x = nn.Conv(self.dims[0], (4, 4), strides=4, name="stem")(img)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down_norm{s}")(x)
                x = nn.Conv(dim, (2, 2), strides=2, name=f"down{s}")(x)
            for b in range(depth):
                x = _ConvNextBlock(dim, name=f"stage{s}_block{b}")(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)
