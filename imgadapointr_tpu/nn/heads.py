"""Point rebuild heads (flax.linen).

- ``Fold``                 → reference models/base_blocks.py:702-744 (FoldingNet
  head: a step² 2D grid seed folded twice through pointwise conv stacks). The
  reference pins its grid to CUDA at construction (base_blocks.py:711); here
  it is a compile-time constant living wherever XLA puts it.
- ``SimpleRebuildFCLayer`` → reference models/base_blocks.py:747-768.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BatchNorm, ConcatDense, dense, gelu


def folding_seed(step: int) -> jnp.ndarray:
    """(step², 2) grid over [-1, 1]² (reference base_blocks.py:709-711)."""
    lin = np.linspace(-1.0, 1.0, step, dtype=np.float32)
    a = np.broadcast_to(lin[None, :], (step, step)).reshape(-1)
    b = np.broadcast_to(lin[:, None], (step, step)).reshape(-1)
    return jnp.asarray(np.stack([a, b], axis=-1))


class Fold(nn.Module):
    """Two-stage folding decoder: token feature (B*, C) → (B*, step², 3)."""

    in_channel: int
    step: int
    hidden_dim: int = 512

    def _fold_stack(self, seed_or_fd, features, name, use_running_average, bn_momentum):
        h = self.hidden_dim
        # virtual concat([seed, features]) @ W — features stay (B, 1, C)
        x = ConcatDense(h, name=f"{name}_conv1")(seed_or_fd, features)
        x = BatchNorm(h, name=f"{name}_bn1")(x, use_running_average, bn_momentum)
        x = nn.relu(x)
        x = dense(h // 2, name=f"{name}_conv2")(x)
        x = BatchNorm(h // 2, name=f"{name}_bn2")(x, use_running_average, bn_momentum)
        x = nn.relu(x)
        return dense(3, name=f"{name}_conv3")(x)

    @nn.compact
    def __call__(self, x, use_running_average: bool = True, bn_momentum=0.1):
        num_sample = self.step * self.step
        bs = x.shape[0]
        features = x[:, None, :]  # (B, 1, C), broadcast inside ConcatDense
        seed = jnp.broadcast_to(folding_seed(self.step)[None], (bs, num_sample, 2))
        fd1 = self._fold_stack(seed, features, "folding1", use_running_average, bn_momentum)
        fd2 = self._fold_stack(fd1, features, "folding2", use_running_average, bn_momentum)
        return fd2  # (B*, step², 3)


class SimpleRebuildFCLayer(nn.Module):
    """FC rebuild head: cat(global-max, token) → Mlp → step·3 offsets.

    Input (B, N, C); output (B, N, step, 3).
    """

    input_dims: int
    step: int
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, rec_feature, deterministic: bool = True):
        B, N, _ = rec_feature.shape
        g = jnp.max(rec_feature, axis=1, keepdims=True)  # (B, 1, C)
        # Mlp over virtual concat([global, token]): fc1 split per part.
        h = ConcatDense(self.hidden_dim, name="layer_fc1")(g, rec_feature)
        out = dense(self.step * 3, name="layer_fc2")(gelu(h))
        return out.reshape(B, N, self.step, 3)
