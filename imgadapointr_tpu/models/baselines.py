"""Classic completion baselines: FoldingNet, PCN, TopNet (flax.linen).

Reference models/external/{FoldingNet.py:7-83, PCN.py:8-79, TopNet.py:29-109}.
All three share the PCN-style PointNet encoder (conv-max-concat-conv-max) and
train with CD-L2 on (coarse, fine).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import MODELS
from ..nn.layers import BatchNorm, ConcatDense, dense
from ..ops import chamfer_l2
from .build import ModelSpec


def _grid_seed(grid_size: int, half: float) -> jnp.ndarray:
    """(grid², 2) grid over [-half, half]²."""
    lin = np.linspace(-half, half, grid_size, dtype=np.float32)
    a = np.broadcast_to(lin[None, :], (grid_size, grid_size)).reshape(-1)
    b = np.broadcast_to(lin[:, None], (grid_size, grid_size)).reshape(-1)
    return jnp.asarray(np.stack([a, b], axis=-1))


class PCNFeatureEncoder(nn.Module):
    """Shared PointNet encoder: (B, N, 3) → (B, out_channel).

    conv(3→128)+BN+ReLU+conv(→256) → max → concat → conv(512→512)+BN+ReLU+
    conv(→C) → max (reference FoldingNet.py:14-27 et al.).
    """

    out_channel: int

    @nn.compact
    def __call__(self, xyz, train: bool = False, bn_momentum=0.1):
        f = dense(128, name="first_conv1")(xyz)
        f = BatchNorm(128, name="first_bn")(f, not train, bn_momentum)
        f = dense(256, name="first_conv2")(nn.relu(f))
        g = jnp.max(f, axis=1, keepdims=True)
        f = ConcatDense(512, name="second_conv1")(g, f)
        f = BatchNorm(512, name="second_bn")(f, not train, bn_momentum)
        f = dense(self.out_channel, name="second_conv2")(nn.relu(f))
        return jnp.max(f, axis=1)  # (B, C)


class FoldingNetModel(nn.Module):
    """Two-fold decoder over a √num_pred grid (reference FoldingNet.py)."""

    config: dict

    @nn.compact
    def __call__(self, xyz, train: bool = False, bn_momentum=0.1):
        cfg = self.config
        num_pred = int(cfg["num_pred"])
        enc_ch = int(cfg["encoder_channel"])
        grid_size = int(num_pred**0.5 + 0.5)
        num_sample = grid_size * grid_size
        B = xyz.shape[0]

        feat = PCNFeatureEncoder(enc_ch, name="encoder")(xyz, train, bn_momentum)

        def fold(inp, features, name):
            h = ConcatDense(512, name=f"{name}_conv1")(inp, features)
            h = BatchNorm(512, name=f"{name}_bn1")(h, not train, bn_momentum)
            h = dense(512, name=f"{name}_conv2")(nn.relu(h))
            h = BatchNorm(512, name=f"{name}_bn2")(h, not train, bn_momentum)
            return dense(3, name=f"{name}_conv3")(nn.relu(h))

        seed = jnp.broadcast_to(_grid_seed(grid_size, 0.5)[None], (B, num_sample, 2))
        features = feat[:, None, :]  # (B, 1, C) — ConcatDense broadcasts
        fd1 = fold(seed, features, "folding1")
        fd2 = fold(fd1, features, "folding2")
        return fd2, fd2  # reference returns the final fold twice (:76)


class PCNModel(nn.Module):
    """Coarse MLP + grid folding dense decoder (reference PCN.py)."""

    config: dict

    GRID_SIZE = 4  # reference PCN.py:13

    @nn.compact
    def __call__(self, xyz, train: bool = False, bn_momentum=0.1):
        cfg = self.config
        num_fine = int(cfg["num_pred"])
        enc_ch = int(cfg["encoder_channel"])
        gs = self.GRID_SIZE
        assert num_fine % gs**2 == 0
        num_coarse = num_fine // gs**2
        B = xyz.shape[0]

        feat = PCNFeatureEncoder(enc_ch, name="encoder")(xyz, train, bn_momentum)

        h = dense(1024, name="mlp1")(feat)
        h = dense(1024, name="mlp2")(nn.relu(h))
        coarse = dense(3 * num_coarse, name="mlp3")(nn.relu(h)).reshape(
            B, num_coarse, 3
        )

        point_feat = jnp.repeat(coarse, gs**2, axis=1)  # (B, N_fine, 3)
        seed = jnp.tile(_grid_seed(gs, 0.05)[None], (B, num_coarse, 1))
        # final_conv over virtual concat([global, seed, point]); global stays (B,1,C)
        h = ConcatDense(512, name="final_conv1")(feat[:, None], seed, point_feat)
        h = BatchNorm(512, name="final_bn1")(h, not train, bn_momentum)
        h = dense(512, name="final_conv2")(nn.relu(h))
        h = BatchNorm(512, name="final_bn2")(h, not train, bn_momentum)
        fine = dense(3, name="final_conv3")(nn.relu(h)) + point_feat
        return coarse, fine


TREE_ARCH = {
    2: [32, 64],
    4: [4, 8, 8, 8],
    6: [2, 4, 4, 4, 4, 4],
    8: [2, 2, 2, 2, 2, 4, 4, 4],
}


def get_arch(nlevels: int, npts: int):
    """Scale the tree arch to npts = 2048·2^k (reference TopNet.py:17-25)."""
    logmult = int(math.log2(npts / 2048))
    assert 2048 * (2**logmult) == npts, f"npts {npts} must be 2048·2^n"
    arch = np.asarray(TREE_ARCH[nlevels])
    while logmult > 0:
        last_min_pos = np.where(arch == np.min(arch))[0][-1]
        arch[last_min_pos] *= 2
        logmult -= 1
    return [int(x) for x in arch]


class TopNetModel(nn.Module):
    """Hierarchical tree decoder (reference TopNet.py:29-109)."""

    config: dict

    @nn.compact
    def __call__(self, xyz, train: bool = False, bn_momentum=0.1):
        cfg = self.config
        node_feature = int(cfg["node_feature"])
        # the reference reads config.encoder_feature (TopNet.py:34) but its
        # shipped config provides encoder_channel — accept both
        encoder_feature = int(
            cfg.get("encoder_feature", cfg.get("encoder_channel", 1024))
        )
        nlevels = int(cfg["nlevels"])
        num_pred = int(cfg["num_pred"])
        tarch = get_arch(nlevels, num_pred)
        B = xyz.shape[0]

        feat = PCNFeatureEncoder(encoder_feature, name="encoder")(
            xyz, train, bn_momentum
        )

        # root: Linear+BN+ReLU ×2 → Linear → tanh (reference :54-63)
        h = dense(256, name="root_fc1")(feat)
        h = BatchNorm(256, name="root_bn1")(h, not train, bn_momentum)
        h = dense(64, name="root_fc2")(nn.relu(h))
        h = BatchNorm(64, name="root_bn2")(h, not train, bn_momentum)
        h = dense(node_feature * tarch[0], name="root_fc3")(nn.relu(h))
        level = jnp.tanh(h).reshape(B, tarch[0], node_feature)

        def tree_layer(x, out_channel, node, name):
            # conv stack halving channels (reference get_tree_layer :80-96);
            # input = concat([global, node_feature]) → ConcatDense
            in_ch = encoder_feature + node_feature
            h = ConcatDense(in_ch // 2, name=f"{name}_c1")(feat[:, None], x)
            h = BatchNorm(in_ch // 2, name=f"{name}_bn1")(h, not train, bn_momentum)
            h = dense(in_ch // 4, name=f"{name}_c2")(nn.relu(h))
            h = BatchNorm(in_ch // 4, name=f"{name}_bn2")(h, not train, bn_momentum)
            h = dense(in_ch // 8, name=f"{name}_c3")(nn.relu(h))
            h = BatchNorm(in_ch // 8, name=f"{name}_bn3")(h, not train, bn_momentum)
            h = dense(out_channel * node, name=f"{name}_c4")(nn.relu(h))
            # (B, n, out*node) → (B, n*node, out)
            n = x.shape[1]
            return h.reshape(B, n * node, out_channel)

        for i in range(1, nlevels):
            if i == nlevels - 1:
                level = jnp.tanh(tree_layer(level, 3, tarch[i], f"leaf"))
            else:
                level = jnp.tanh(
                    tree_layer(level, node_feature, tarch[i], f"level{i}")
                )
        return level, level


def _cdl2_loss(ret, gt, epoch):
    return chamfer_l2(ret[0], gt), chamfer_l2(ret[1], gt)


@MODELS.register_module(name="FoldingNet")
def build_foldingnet(config, **kw):
    return ModelSpec(FoldingNetModel(config, **kw), _cdl2_loss, ("partial",))


@MODELS.register_module(name="PCN")
def build_pcn(config, **kw):
    return ModelSpec(PCNModel(config, **kw), _cdl2_loss, ("partial",))


@MODELS.register_module(name="TopNet")
def build_topnet(config, **kw):
    return ModelSpec(TopNetModel(config, **kw), _cdl2_loss, ("partial",))
