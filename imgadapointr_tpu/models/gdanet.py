"""GDANet part-segmentation network (flax.linen, batch-last).

Reference models/segmentation/{GDANet_ptseg.py:7-131, GDANet_util.py:5-213}:
three edge-conv blocks, the first two followed by the Geometry-Disentangle
Module (graph-Laplacian sharp/gentle split) + SGCAM complementary attention;
a 50-way seg head whose 128-d penultimate features are the tap consumed by
the Seg* AdaPoinTr variants (GDANet_ptseg.py:123).

Used frozen: weights loaded from a pretrained checkpoint (--gdanet_w) with
gradients masked off. We run its BatchNorms on running stats always (the
reference leaves them in train mode, letting frozen-model BN stats drift —
an upstream quirk, not replicated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import index_points, square_distance
from ..nn.layers import BatchNorm, dense


def _knn_desc(x: jax.Array, k: int):
    """kNN over feature space; returns (idx, p) with p = -sqdist
    (reference GDANet_util.py:5-11)."""
    p = -square_distance(x, x)
    _, idx = jax.lax.top_k(p, k)
    return idx.astype(jnp.int32), p


def local_operator(x: jax.Array, k: int) -> jax.Array:
    """Edge features cat(neighbor − x, neighbor): (B, N, C) → (B, N, k, 2C)
    (reference GDANet_util.py:14-38)."""
    idx, _ = _knn_desc(x, k)
    nbr = index_points(x, idx)
    xc = jnp.broadcast_to(x[:, :, None], nbr.shape)
    return jnp.concatenate([nbr - xc, nbr], axis=-1)


def local_operator_withnorm(x: jax.Array, norm: jax.Array, k: int) -> jax.Array:
    """cat(neighbor − x, neighbor, neighbor_normal): → (B, N, k, 3C)
    (reference GDANet_util.py:41-73)."""
    idx, _ = _knn_desc(x, k)
    nbr = index_points(x, idx)
    nbr_norm = index_points(norm, idx)
    xc = jnp.broadcast_to(x[:, :, None], nbr.shape)
    return jnp.concatenate([nbr - xc, nbr, nbr_norm], axis=-1)


def gdm(x: jax.Array, M: int, k: int = 64, tau: float = 0.2, sigma: float = 2.0):
    """Geometry-Disentangle Module (reference GDANet_util.py:76-151).

    x: (B, N, C) features. Returns (sharp, gentle): (B, M, C) each — the M
    points with largest / smallest ||x_i − Σ_j Â_ij x_j||² over the local
    normalized adjacency.
    """
    B, N, C = x.shape
    M = min(M, N)
    k = min(k, N)
    idx, p = _knn_desc(x, k)  # p = -sqdist
    mask = jnp.sqrt(jnp.abs(p)) < tau
    w = jnp.exp(p / (sigma * sigma)) * mask.astype(x.dtype)
    colsum = jnp.sum(w, axis=1)  # Σ_r w[r, i] (torch dim=1)
    A = w / jnp.maximum(colsum, 1e-12)[:, :, None]
    # local Â_ij at the k−1 non-self neighbours
    nbr_idx = idx[:, :, 1:]
    A_local = jnp.take_along_axis(A, nbr_idx, axis=2)  # (B, N, k-1)
    nbr = index_points(x, nbr_idx)  # (B, N, k-1, C)
    n = jnp.sum(A_local[..., None] * nbr, axis=2)  # (B, N, C)
    pai = jnp.sum((x - n) ** 2, axis=-1)  # (B, N)
    _, sharp_idx = jax.lax.top_k(pai, M)
    _, gentle_idx = jax.lax.top_k(-pai, M)
    return index_points(x, sharp_idx), index_points(x, gentle_idx)


class SGCAM(nn.Module):
    """Sharp-Gentle Complementary Attention (reference GDANet_util.py:154-212).

    Non-local attention from x (B, N, C) onto component x2 (B, M, C); the
    output projection's BN scale is zero-initialised so the module starts as
    identity (reference :179-180).
    """

    in_channels: int

    @nn.compact
    def __call__(self, x, x2, use_running_average: bool = True):
        inter = max(self.in_channels // 2, 1)
        g = dense(inter, name="g")(x2)  # (B, M, inter)
        theta = dense(inter, name="theta")(x)  # (B, N, inter)
        phi = dense(inter, name="phi")(x2)  # (B, M, inter)
        W = jnp.einsum("bni,bmi->bnm", theta, phi) / x2.shape[1]
        y = jnp.einsum("bnm,bmi->bni", W, g)  # (B, N, inter)
        y = dense(self.in_channels, name="W_conv")(y)
        # BN with zero-init scale
        ra_mean = self.variable("batch_stats", "W_bn_mean", lambda: jnp.zeros(self.in_channels))
        ra_var = self.variable("batch_stats", "W_bn_var", lambda: jnp.ones(self.in_channels))
        scale = self.param("W_bn_scale", nn.initializers.zeros, (self.in_channels,))
        bias = self.param("W_bn_bias", nn.initializers.zeros, (self.in_channels,))
        yn = (y - ra_mean.value) * jax.lax.rsqrt(ra_var.value + 1e-5)
        return yn * scale + bias + x


class GDANet(nn.Module):
    """(coor (B,N,3), normals (B,N,3), cls one-hot (B,16)) →
    (features (B,N,128), log-probs (B,N,num_classes))."""

    num_classes: int = 50
    deterministic: bool = True

    def _conv_bn(self, x, ch, name, ura=True):
        x = dense(ch, name=f"{name}_conv")(x)
        return BatchNorm(ch, name=f"{name}_bn")(x, ura)

    @nn.compact
    def __call__(self, coor, normals, cls_vec, deterministic: bool = True):
        B, N, _ = coor.shape
        relu = nn.relu

        # block 1 (with normals)
        x1 = local_operator_withnorm(coor, normals, k=min(30, N))  # (B,N,k,9)
        x1 = relu(self._conv_bn(x1, 64, "conv1"))
        x1 = relu(self._conv_bn(x1, 64, "conv11"))
        x1 = jnp.max(x1, axis=2)  # (B, N, 64)
        x1h, x1l = gdm(x1, M=512)
        x1h = SGCAM(64, name="SGCAM_1s")(x1, x1h)
        x1l = SGCAM(64, name="SGCAM_1g")(x1, x1l)
        x1 = relu(self._conv_bn(jnp.concatenate([x1h, x1l], -1), 64, "conv12"))

        # block 2
        x1t = jnp.concatenate([coor, x1], axis=-1)  # (B, N, 67)
        x2 = local_operator(x1t, k=min(30, N))  # (B,N,k,134)
        x2 = relu(self._conv_bn(x2, 64, "conv2"))
        x2 = relu(self._conv_bn(x2, 64, "conv21"))
        x2 = jnp.max(x2, axis=2)
        x2h, x2l = gdm(x2, M=512)
        x2h = SGCAM(64, name="SGCAM_2s")(x2, x2h)
        x2l = SGCAM(64, name="SGCAM_2g")(x2, x2l)
        x2 = relu(self._conv_bn(jnp.concatenate([x2h, x2l], -1), 64, "conv22"))

        # block 3
        x2t = jnp.concatenate([x1t, x2], axis=-1)  # (B, N, 131)
        x3 = local_operator(x2t, k=min(30, N))  # (B,N,k,262)
        x3 = relu(self._conv_bn(x3, 128, "conv3"))
        x3 = relu(self._conv_bn(x3, 128, "conv31"))
        x3 = jnp.max(x3, axis=2)
        x3 = relu(self._conv_bn(x3, 128, "conv32"))

        xx = jnp.concatenate([x1, x2, x3], axis=-1)  # (B, N, 256)
        xc = relu(self._conv_bn(xx, 512, "conv4"))
        xc = jnp.max(xc, axis=1)  # (B, 512)

        clsf = relu(self._conv_bn(cls_vec[:, None, :], 64, "convc"))[:, 0]  # (B, 64)
        glob = jnp.concatenate([xc, clsf], axis=-1)[:, None, :]  # (B, 1, 576)

        x = jnp.concatenate([xx, jnp.broadcast_to(glob, (B, N, 576))], axis=-1)
        x = relu(self._conv_bn(x, 256, "conv5"))
        x = nn.Dropout(0.4)(x, deterministic=deterministic)
        x = relu(self._conv_bn(x, 256, "conv6"))
        x = nn.Dropout(0.4)(x, deterministic=deterministic)
        feat = relu(self._conv_bn(x, 128, "conv7"))  # the 128-d feature tap
        logits = dense(self.num_classes, name="conv8")(feat)
        return feat, jax.nn.log_softmax(logits, axis=-1)
