"""Epoch-based schedules (LR, BN momentum, warmup) as pure functions.

Reference semantics:
- ``lambda_lr``      → utils/misc.py:46-55 (LambdaLR with optional warmup:
  factor = max(lr_decay^((e-warm)/decay_step), lowest_decay), warmup ramp
  max(e/warm, 0.001)).
- ``bn_momentum``    → utils/misc.py:57-62,119-149 (BNMomentumScheduler:
  m(e) = max(bn_momentum·bn_decay^(e/decay_step), lowest_decay)).
- ``gradual_warmup`` → utils/misc.py:287-346 (multiplier ramp 1→multiplier
  over total_epoch, then hands off to the after_scheduler).
- ``step_lr``        → torch StepLR (builder.py:76-77).
- ``cos_lr``         → timm CosineLRScheduler usage (builder.py:78-86):
  cosine decay from lr to min_lr over (epochs - warmup), linear warmup from
  warmup_lr_init.

All functions map ``epoch (float) -> multiplier-or-value`` and are safe to
call with traced values (no Python branching on epoch).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _ep(epoch):
    """Epoch as >= f32: f32 in production, f64 under the x64 parity harness
    (hard-f32 schedules put a uniform ~5e-8 rel error on every lr/alpha —
    visible as systematic AdamW-update drift vs the fp64 torch reference).

    Integer epochs (e.g. optax's int32 step count) go to the DEFAULT float
    dtype — promote_types(int32, f32) would pin them to f32 even under x64.
    """
    e = jnp.asarray(epoch)
    if not jnp.issubdtype(e.dtype, jnp.floating):
        return e.astype(jnp.result_type(float))
    return e.astype(jnp.promote_types(e.dtype, jnp.float32))


def lambda_lr_factor(epoch, lr_decay, decay_step, lowest_decay, warmingup_e=0):
    e = _ep(epoch)
    decayed = jnp.maximum(lr_decay ** ((e - warmingup_e) / decay_step), lowest_decay)
    if warmingup_e > 0:
        warm = jnp.maximum(e / warmingup_e, 0.001)
        return jnp.where(e >= warmingup_e, decayed, warm)
    return decayed


def bn_momentum(epoch, bn_momentum=0.9, bn_decay=0.5, decay_step=21, lowest_decay=0.01):
    e = _ep(epoch)
    return jnp.maximum(bn_momentum * bn_decay ** (e / decay_step), lowest_decay)


def step_lr_factor(epoch, decay_step, gamma=0.1):
    e = _ep(epoch)
    return gamma ** jnp.floor(e / decay_step)


def cos_lr_value(epoch, t_max, lr, min_lr, warmup_e=0, warmup_lr_init=1e-6):
    e = _ep(epoch)
    warm = warmup_lr_init + (lr - warmup_lr_init) * e / max(warmup_e, 1)
    t = jnp.clip((e - warmup_e) / max(t_max - warmup_e, 1), 0.0, 1.0)
    cos = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(math.pi * t))
    return jnp.where(e < warmup_e, warm, cos)


def gradual_warmup_lr(
    epoch, base_lr, multiplier, total_epoch, after_step_size=None, after_gamma=0.1
):
    """GradualWarmupScheduler semantics (reference utils/misc.py:287-346):

    - ``e <= total_epoch``: with multiplier==1 the lr ramps 0 → base_lr
      (``base_lr * e / total_epoch``); with multiplier>1 it ramps
      base_lr → base_lr*multiplier. The after-scheduler does NOT decay
      during warmup.
    - ``e > total_epoch``: hand off to the after-scheduler (StepLR here)
      evaluated at ``e - total_epoch`` with base ``base_lr * multiplier``.
    """
    e = _ep(epoch)
    if multiplier == 1.0:
        warm = base_lr * e / total_epoch
    else:
        warm = base_lr * (1.0 + (multiplier - 1.0) * jnp.clip(e / total_epoch, 0.0, 1.0))
    if after_step_size is not None:
        after = (
            base_lr
            * multiplier
            * after_gamma ** jnp.floor((e - total_epoch) / after_step_size)
        )
    else:
        after = jnp.asarray(base_lr * multiplier, jnp.float32)
    return jnp.where(e <= total_epoch, warm, after)


def build_lr_schedule(base_lr: float, sched_cfg, max_epoch: int):
    """Return ``f(epoch) -> lr`` from a config ``scheduler`` block."""
    t = sched_cfg.type
    if t == "GradualWarmup" and "kwargs_1" in sched_cfg:
        # reference SnowFlakeNet.yaml format: kwargs_1 = StepLR-after,
        # kwargs_2 = warmup (tools/builder.py:64-75)
        k1, k2 = sched_cfg.kwargs_1, sched_cfg.kwargs_2
        step_size = k1.get("step_size", 50)
        gamma = k1.get("gamma", 0.5)
        mult = k2.get("multiplier", 1.0)
        total = k2.get("total_epoch", 1)
        return lambda e: gradual_warmup_lr(e, base_lr, mult, total, step_size, gamma)
    k = sched_cfg.kwargs
    if t == "LambdaLR":
        return lambda e: base_lr * lambda_lr_factor(
            e, k.lr_decay, k.decay_step, k.lowest_decay, k.get("warmingup_e", 0)
        )
    if t == "StepLR":
        step_size = k.get("step_size", k.get("decay_step", 50))
        return lambda e: base_lr * step_lr_factor(e, step_size, k.get("gamma", 0.1))
    if t == "CosLR":
        return lambda e: cos_lr_value(
            e, k.get("t_max", max_epoch), base_lr,
            k.get("min_lr", 1e-6), k.get("initial_epochs", 0),
        )
    if t == "GradualWarmup":
        # reference builder.py:64-75: warmup wraps StepLR-after
        after = k.get("after", None)
        mult = k.get("multiplier", 1.0)
        total = k.get("total_epoch", 1)
        if after is not None and after.type == "StepLR":
            ak = after.kwargs
            return lambda e: gradual_warmup_lr(
                e, base_lr, mult, total, ak.decay_step, ak.get("gamma", 0.1)
            )
        return lambda e: gradual_warmup_lr(e, base_lr, mult, total)
    raise NotImplementedError(f"scheduler type {t}")


def build_bnm_schedule(bnm_cfg):
    """Return ``f(epoch) -> torch-style BN momentum`` from a ``bnmscheduler`` block."""
    if bnm_cfg is None:
        return lambda e: 0.1  # torch BatchNorm default momentum
    k = bnm_cfg.kwargs
    return lambda e: bn_momentum(
        e, k.get("bn_momentum", 0.9), k.get("bn_decay", 0.5),
        k.get("decay_step", 21), k.get("lowest_decay", 0.01),
    )
