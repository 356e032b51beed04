"""Pure loss functions for the model zoo.

Reference semantics:
- ``adapointr_loss``  → models/external/AdaPoinTr.py:193-216 (denoise CD-L1 on
  kNN-gathered targets ×0.5; recon = CD-L1(coarse) + CD-L1(fine)).
- ``variable_recon_loss`` → models/internal/ImgResNetEncAdaPoinTrVariableLoss.py:79-97
  (recon = alpha(epoch)·CD-L1(coarse) + CD-L1(fine), alpha from CycleLR).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import chamfer_l1, index_points, knn_point


def denoise_targets(gt: jax.Array, denoised_coarse: jax.Array, factor: int) -> jax.Array:
    """kNN-gathered ground-truth targets for the denoise task.

    ``idx = knn(factor, gt, denoised_coarse); target = gt[idx].reshape(B,-1,3)``
    (reference AdaPoinTr.py:201-205). Targets are constants: no gradient
    should flow into gt through the kNN selection.
    """
    idx = knn_point(factor, gt, denoised_coarse)  # (B, L, factor)
    target = index_points(gt, idx)  # (B, L, factor, 3)
    return jax.lax.stop_gradient(target.reshape(gt.shape[0], -1, 3))


def adapointr_loss(ret, gt, factor: int, coarse_alpha: float | jax.Array = 1.0):
    """Returns ``(loss_denoised, loss_recon)``.

    ``coarse_alpha`` = 1 reproduces AdaPoinTr's plain loss; an epoch-dependent
    alpha reproduces the VariableLoss variants.
    """
    pred_coarse, denoised_coarse, denoised_fine, pred_fine = ret
    target = denoise_targets(gt, denoised_coarse, factor)
    loss_denoised = 0.5 * chamfer_l1(denoised_fine, target)
    loss_coarse = chamfer_l1(pred_coarse, gt)
    loss_fine = chamfer_l1(pred_fine, gt)
    loss_recon = coarse_alpha * loss_coarse + loss_fine
    return loss_denoised, loss_recon


def cycle_alpha(epoch, step_size=5, max_lr=1.0, base_lr=0.01, gamma=0.995):
    """CycleLR used as the variable-loss coarse alpha schedule.

    Reference models/base_blocks.py:771-783 (instantiated with
    CycleLR(5, 1, gamma=0.995) at ImgResNetEncAdaPoinTrVariableLoss.py:36-37,
    queried per epoch at :93-95).
    """
    from ..utils.schedulers import _ep

    # _ep, not a bare promote: an INTEGER epoch under the x64 parity harness
    # must evaluate the table in f64 (promote_types(int32, f32) pins to f32)
    e = _ep(epoch)
    cycle = jnp.floor(1.0 + e / (2 * step_size))
    x = jnp.abs(e / step_size - 2 * cycle + 1)
    return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x) * gamma**e
