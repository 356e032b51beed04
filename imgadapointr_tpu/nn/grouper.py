"""Point-cloud front-end encoders (flax.linen), batch-last layout.

- ``DGCNNGrouper``  → reference models/base_blocks.py:516-629 (4 edge-conv
  layers with GroupNorm(4)/LeakyReLU(0.2) and two FPS downsamplings).
- ``PCNEncoder``    → reference models/base_blocks.py:632-662 (per-group
  PointNet: conv-max-concat-conv-max).
- ``SimpleEncoder`` → reference models/base_blocks.py:665-698 (FPS centers +
  kNN neighbourhoods fed to PCNEncoder).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import fps, furthest_point_sample, index_points, knn_point
from .layers import BatchNorm, ConcatDense, dense, leaky_relu


class DGCNNGrouper(nn.Module):
    """DGCNN feature grouper: edge convs + two FPS downsamplings.

    Input (B, N, 3); output (coor (B, num[-1], 3), feat (B, num[-1], 128)).
    """

    k: int = 16

    def _graph_feature(self, coor_q, x_q, coor_k, x_k):
        """Edge feature: for each query point, cat(f_nbr − f_q, f_q) over kNN.

        Reference base_blocks.py:565-588.
        """
        idx = knn_point(self.k, coor_k, coor_q)  # (B, Nq, k)
        nbr = index_points(x_k, idx)  # (B, Nq, k, C)
        xq = jnp.broadcast_to(x_q[:, :, None], nbr.shape)
        return jnp.concatenate([nbr - xq, xq], axis=-1)

    @staticmethod
    def _fps_downsample(coor, x, num_group: int):
        idx = furthest_point_sample(coor, num_group)
        return index_points(coor, idx), index_points(x, idx)

    def _edge_layer(self, feat, out_ch: int, name: str):
        """1×1 Conv2d (= pointwise Dense) + GroupNorm(4) + LeakyReLU(0.2),
        then max over the neighbour axis."""
        f = dense(out_ch, use_bias=False, name=f"{name}_conv")(feat)
        f = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"{name}_gn")(f)
        f = leaky_relu(f)
        return jnp.max(f, axis=2)

    @nn.compact
    def __call__(self, x, num: Sequence[int], train: bool = False):
        coor = x  # (B, N, 3)
        input_trans = dense(8, name="input_trans")
        f = input_trans(x)

        if train:
            # Layer 1, TRAIN form: commute the pointwise input linear past
            # the neighbour gather — gather(dense(x), idx) ==
            # dense(gather(x, idx)) exactly (same dot per output element),
            # but the backward changes from a (B, N, k, 8)→(B, N, 8)
            # scatter-add (the single most expensive op of the grouper
            # backward in the train-step trace, ~7 ms at the paper recipe)
            # into a plain matmul reduction for dW: the gathered operand is
            # the raw input cloud, which needs no gradient, so NO scatter
            # remains. dense() shares parameters with f above. Measured:
            # train step 133.8 → 125.8 ms; convergence-gate pass at CD-L1
            # 11.82 @ep20 (band 12.3±0.4).
            idx = knn_point(self.k, coor, coor)  # (B, N, k)
            nbr = input_trans(index_points(coor, idx))  # == index_points(f, idx)
            xq = jnp.broadcast_to(f[:, :, None], nbr.shape)
            feat = jnp.concatenate([nbr - xq, xq], axis=-1)
        else:
            # EVAL form: gather the 8-d features directly — the commuted
            # form costs ~+3 ms at eval bs32 (extra dense materialisation
            # with no backward to save); the two forms are bit-identical.
            feat = self._graph_feature(coor, f, coor, f)
        f = self._edge_layer(feat, 32, "layer1")
        coor_q, f_q = self._fps_downsample(coor, f, num[0])
        f = self._edge_layer(self._graph_feature(coor_q, f_q, coor, f), 64, "layer2")
        coor = coor_q

        f = self._edge_layer(self._graph_feature(coor, f, coor, f), 64, "layer3")
        coor_q, f_q = self._fps_downsample(coor, f, num[1])
        f = self._edge_layer(self._graph_feature(coor_q, f_q, coor, f), 128, "layer4")
        coor = coor_q
        return coor, f

    @property
    def num_features(self):
        return 128


class PCNEncoder(nn.Module):
    """Per-group PointNet encoder (reference base_blocks.py:632-662).

    Input (B, G, N, 3) point groups → (B, G, encoder_channel) features.
    """

    encoder_channel: int

    @nn.compact
    def __call__(self, point_groups, use_running_average: bool = True, bn_momentum=0.1):
        B, G, N, _ = point_groups.shape
        pg = point_groups.reshape(B * G, N, 3)
        f = dense(128, name="first_conv1")(pg)
        f = BatchNorm(128, name="first_bn")(f, use_running_average, bn_momentum)
        f = nn.relu(f)
        f = dense(256, name="first_conv2")(f)  # (BG, N, 256)
        g = jnp.max(f, axis=1, keepdims=True)  # (BG, 1, 256)
        # virtual concat([global, f]) @ W; global stays un-broadcast
        f = ConcatDense(512, name="second_conv1")(g, f)
        f = BatchNorm(512, name="second_bn")(f, use_running_average, bn_momentum)
        f = nn.relu(f)
        f = dense(self.encoder_channel, name="second_conv2")(f)
        g = jnp.max(f, axis=1)  # (BG, C)
        return g.reshape(B, G, self.encoder_channel)


class SimpleEncoder(nn.Module):
    """'pn' encoder_type: FPS centers + kNN groups → PCNEncoder.

    Reference base_blocks.py:665-698.
    """

    k: int = 32
    embed_dims: int = 128

    @nn.compact
    def __call__(self, xyz, n_group, use_running_average: bool = True, bn_momentum=0.1):
        if isinstance(n_group, (list, tuple)):
            n_group = n_group[-1]
        center = fps(xyz, n_group)  # (B, G, 3)
        idx = knn_point(self.k, xyz, center)  # (B, G, k)
        neighborhood = index_points(xyz, idx)  # (B, G, k, 3)
        features = PCNEncoder(self.embed_dims, name="embedding")(
            neighborhood, use_running_average, bn_momentum
        )
        return center, features

    @property
    def num_features(self):
        return self.embed_dims
