"""SnowFlakeNet (flax.linen, batch-last).

Reference models/external/SnowFlakeNet.py:19-290 + SnowFlakeNet_utils.py:
PointNet++ SA(kNN) + point-transformer encoder; SeedGenerator + stacked SPD
(skip-transformer + point-wise splitting deconv) decoder; 4-level
FPS-matched CD-L1 loss + one-sided partial matching.

Torch deconv equivalences used here:
- ``ConvTranspose1d(C, 128, num_pc)`` on a length-1 input ≡ Dense(128·num_pc)
  reshaped to (B, num_pc, 128) (SeedGenerator.ps, reference :117).
- ``ConvTranspose1d(32, 128, up, stride=up)`` ≡ per-point Dense(128·up)
  reshaped to (B, N·up, 128) (SPD.ps, reference :151).
- ``nn.Upsample(scale_factor=up)`` ≡ ``jnp.repeat(x, up, axis=1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import BatchNorm, dense
from ..ops import chamfer_l1, chamfer_l1_pm, fps, index_points, knn_point
from ..utils.registry import MODELS
from .build import ModelSpec


class MLPConv(nn.Module):
    """Pointwise conv stack: ReLU between layers, none after the last
    (reference MLP_CONV)."""

    layer_dims: tuple

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate(self.layer_dims[:-1]):
            x = nn.relu(dense(ch, name=f"c{i}")(x))
        return dense(self.layer_dims[-1], name=f"c{len(self.layer_dims)-1}")(x)


class MLPRes(nn.Module):
    """conv→relu→conv + shortcut conv (reference MLP_Res)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        shortcut = dense(self.out_dim, name="shortcut")(x)
        h = nn.relu(dense(self.hidden_dim, name="c1")(x))
        return dense(self.out_dim, name="c2")(h) + shortcut


def query_knn(nsample, xyz, new_xyz, include_self=True):
    """kNN with optional self-exclusion (reference utils query_knn:284-289)."""
    pad = 0 if include_self else 1
    idx = knn_point(nsample + pad, xyz, new_xyz)
    return idx[:, :, pad:]


class _PosAttention(nn.Module):
    """Shared vector-attention core of Transformer/SkipTransformer:
    softmax over attn_mlp(q−k + pos_emb), aggregated against (v + pos_emb)."""

    dim: int
    n_knn: int = 16
    pos_hidden_dim: int = 64
    attn_mult: int = 4

    @nn.compact
    def __call__(self, key, query, value, pos, train=False, bn_momentum=0.1):
        idx = query_knn(self.n_knn, pos, pos)
        key_g = index_points(key, idx)  # (B, N, k, dim)
        qk_rel = query[:, :, None] - key_g
        pos_rel = pos[:, :, None] - index_points(pos, idx)  # (B, N, k, 3)

        pe = dense(self.pos_hidden_dim, name="pos1")(pos_rel)
        pe = BatchNorm(self.pos_hidden_dim, name="pos_bn")(pe, not train, bn_momentum)
        pe = dense(self.dim, name="pos2")(nn.relu(pe))

        a = dense(self.dim * self.attn_mult, name="attn1")(qk_rel + pe)
        a = BatchNorm(self.dim * self.attn_mult, name="attn_bn")(a, not train, bn_momentum)
        a = dense(self.dim, name="attn2")(nn.relu(a))
        a = jax.nn.softmax(a, axis=2)  # softmax over neighbours

        v = value[:, :, None] + pe
        return jnp.sum(a * v, axis=2)  # (B, N, dim)


class SFTransformer(nn.Module):
    """Point-transformer block (reference utils Transformer:393-453)."""

    in_channel: int
    dim: int = 256
    n_knn: int = 16

    @nn.compact
    def __call__(self, x, pos, train=False, bn_momentum=0.1):
        identity = x
        h = dense(self.dim, name="linear_start")(x)
        key = dense(self.dim, name="conv_key")(h)
        query = dense(self.dim, name="conv_query")(h)
        value = dense(self.dim, name="conv_value")(h)
        agg = _PosAttention(self.dim, self.n_knn, name="attn")(
            key, query, value, pos, train, bn_momentum
        )
        return dense(self.in_channel, name="linear_end")(agg) + identity


class SkipTransformer(nn.Module):
    """Reference SnowFlakeNet.py:19-81."""

    in_channel: int
    dim: int = 256
    n_knn: int = 16

    @nn.compact
    def __call__(self, pos, key, query, train=False, bn_momentum=0.1):
        value = MLPRes(self.in_channel, self.in_channel, name="mlp_v")(
            jnp.concatenate([key, query], axis=-1)
        )
        identity = value
        k = dense(self.dim, name="conv_key")(key)
        q = dense(self.dim, name="conv_query")(query)
        v = dense(self.dim, name="conv_value")(value)
        agg = _PosAttention(self.dim, self.n_knn, name="attn")(
            k, q, v, pos, train, bn_momentum
        )
        return dense(self.in_channel, name="conv_end")(agg) + identity


class SAModuleKNN(nn.Module):
    """PointNet++ set abstraction over FPS centers + kNN groups
    (reference utils PointNet_SA_Module_KNN:341-380). if_bn=False in all
    SnowFlakeNet uses; last conv has no activation."""

    npoint: int | None
    nsample: int | None
    mlp: tuple
    group_all: bool = False
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, points):
        if self.group_all:
            grouped = points[:, None]  # (B, 1, N, f)
            if self.use_xyz:
                grouped = jnp.concatenate([xyz[:, None], grouped], axis=-1)
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        else:
            new_xyz = fps(xyz, self.npoint)
            idx = query_knn(self.nsample, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None]
            grouped = index_points(points, idx)
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
        h = grouped
        for i, ch in enumerate(self.mlp[:-1]):
            h = nn.relu(dense(ch, name=f"c{i}")(h))
        h = dense(self.mlp[-1], name=f"c{len(self.mlp)-1}")(h)
        return new_xyz, jnp.max(h, axis=2)


class FeatureExtractor(nn.Module):
    """Reference SnowFlakeNet.py:83-112."""

    out_dim: int = 1024

    @nn.compact
    def __call__(self, xyz, train=False, bn_momentum=0.1):
        l1_xyz, l1_points = SAModuleKNN(512, 16, (64, 128), name="sa1")(xyz, xyz)
        l1_points = SFTransformer(128, dim=64, name="t1")(
            l1_points, l1_xyz, train, bn_momentum
        )
        l2_xyz, l2_points = SAModuleKNN(128, 16, (128, 256), name="sa2")(
            l1_xyz, l1_points
        )
        l2_points = SFTransformer(256, dim=64, name="t2")(
            l2_points, l2_xyz, train, bn_momentum
        )
        _, l3_points = SAModuleKNN(
            None, None, (512, self.out_dim), group_all=True, name="sa3"
        )(l2_xyz, l2_points)
        return l3_points[:, 0]  # (B, out_dim)


class SeedGenerator(nn.Module):
    """Reference SnowFlakeNet.py:114-134."""

    dim_feat: int = 512
    num_pc: int = 256

    @nn.compact
    def __call__(self, feat):
        B = feat.shape[0]
        x1 = dense(128 * self.num_pc, name="ps")(feat).reshape(B, self.num_pc, 128)
        featb = jnp.broadcast_to(feat[:, None], (B, self.num_pc, self.dim_feat))
        x1 = MLPRes(128, 128, name="mlp1")(jnp.concatenate([x1, featb], -1))
        x2 = MLPRes(64, 128, name="mlp2")(x1)
        x3 = MLPRes(128, 128, name="mlp3")(jnp.concatenate([x2, featb], -1))
        h = nn.relu(dense(64, name="mlp4a")(x3))
        return dense(3, name="mlp4b")(h)  # (B, num_pc, 3)


class SPD(nn.Module):
    """Snowflake Point Deconvolution (reference SnowFlakeNet.py:137-186)."""

    dim_feat: int = 512
    up_factor: int = 2
    i: int = 0
    radius: float = 1.0

    @nn.compact
    def __call__(self, pcd_prev, feat_global, k_prev=None, train=False, bn_momentum=0.1):
        B, N, _ = pcd_prev.shape
        up = self.up_factor
        f1 = MLPConv((64, 128), name="mlp1")(pcd_prev)
        g = jnp.max(f1, axis=1, keepdims=True)
        fg = feat_global[:, None]
        feat_1 = jnp.concatenate(
            [
                f1,
                jnp.broadcast_to(g, f1.shape),
                jnp.broadcast_to(fg, (B, N, self.dim_feat)),
            ],
            axis=-1,
        )
        Q = MLPConv((256, 128), name="mlp2")(feat_1)

        H = SkipTransformer(128, dim=64, name="skip_transformer")(
            pcd_prev, k_prev if k_prev is not None else Q, Q, train, bn_momentum
        )

        feat_child = MLPConv((64, 32), name="mlp_ps")(H)
        feat_child = dense(128 * up, use_bias=False, name="ps")(feat_child).reshape(
            B, N * up, 128
        )
        H_up = jnp.repeat(H, up, axis=1)
        K_curr = MLPRes(128, 128, name="mlp_delta_feature")(
            jnp.concatenate([feat_child, H_up], -1)
        )
        delta = jnp.tanh(MLPConv((64, 3), name="mlp_delta")(nn.relu(K_curr)))
        delta = delta / self.radius**self.i
        pcd_child = jnp.repeat(pcd_prev, up, axis=1) + delta
        return pcd_child, K_curr


class SnowFlakeNetModel(nn.Module):
    """Reference SnowFlakeNet.py:224-290. Train returns
    (Pc, P1, P2, P3, partial); eval returns (P1, P3)."""

    config: dict

    @nn.compact
    def __call__(self, xyz, train: bool = False, bn_momentum=0.1):
        cfg = self.config
        dim_feat = int(cfg["dim_feat"])
        num_pc = int(cfg["num_pc"])
        num_p0 = int(cfg["num_p0"])
        radius = float(cfg["radius"])
        up_factors = [1] + [int(u) for u in cfg["up_factors"]]

        feat = FeatureExtractor(dim_feat, name="feat_extractor")(
            xyz, train, bn_momentum
        )
        pcd = SeedGenerator(dim_feat, num_pc, name="decoder_coarse")(feat)
        arr = [pcd]
        pcd = fps(jnp.concatenate([pcd, xyz], axis=1), num_p0)
        k_prev = None
        for i, up in enumerate(up_factors):
            pcd, k_prev = SPD(
                dim_feat, up_factor=up, i=i, radius=radius, name=f"upper{i}"
            )(pcd, feat, k_prev, train, bn_momentum)
            arr.append(pcd)

        if train:
            return (*arr, xyz)
        return arr[1], arr[-1]


def snowflake_loss(ret, gt, epoch):
    """4-level FPS-matched CD-L1 + partial matching ×1000
    (reference SnowFlakeNet.py:253-278)."""
    Pc, P1, P2, P3, partial = ret
    gt_2 = fps(gt, P2.shape[1])
    gt_1 = fps(gt_2, P1.shape[1])
    gt_c = fps(gt_1, Pc.shape[1])
    cdc = chamfer_l1(Pc, gt_c)
    cd1 = chamfer_l1(P1, gt_1)
    cd2 = chamfer_l1(P2, gt_2)
    cd3 = chamfer_l1(P3, gt)
    partial_matching = chamfer_l1_pm(partial, P3)
    return (cdc + cd1 + cd2 + partial_matching) * 1000.0, cd3 * 1000.0


@MODELS.register_module(name="SnowFlakeNet")
def build_snowflakenet(config, **kw):
    return ModelSpec(SnowFlakeNetModel(config, **kw), snowflake_loss, ("partial",))
