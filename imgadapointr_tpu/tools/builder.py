"""Factories: dataset loaders, optimizer, schedules.

Reference tools/builder.py:14-86. AdamW masks weight decay off all 1-D
params (biases, norm scales) exactly like add_weight_decay
(tools/builder.py:40-53).
"""

from __future__ import annotations

import jax
import optax

from ..datasets.loader import DataLoader
from ..utils.registry import build_dataset_from_cfg
from ..utils.schedulers import build_bnm_schedule, build_lr_schedule


def dataset_builder(args, dataset_cfg, logger=None):
    """Build (dataset, loader). Per-host batch = total_bs // num_hosts
    (reference main.py:43-47 divided per rank; devices-per-host split is
    handled by the mesh data axis)."""
    dataset = build_dataset_from_cfg(dataset_cfg)
    subset = dataset_cfg.others.subset
    is_train = subset == "train"
    num_hosts = jax.process_count()
    if is_train:
        bs_total = int(dataset_cfg.others.get("bs", 1))
        assert bs_total % num_hosts == 0, "total_bs must divide across hosts"
        bs = bs_total // num_hosts
    else:
        bs = int(dataset_cfg.others.get("bs", 1))
    loader = DataLoader(
        dataset,
        batch_size=bs,
        shuffle=is_train,
        drop_last=is_train,
        seed=getattr(args, "seed", 0),
        num_workers=getattr(args, "num_workers", 8),
        num_hosts=num_hosts if is_train else 1,
        host_id=jax.process_index() if is_train else 0,
        worker_mode=getattr(args, "worker_mode", "thread"),
    )
    return dataset, loader


# Parameter subtrees that receive ZERO gradient by construction — the
# query-ranking MLP (argsort discards its tangent) and the deformable
# offset nets (non-differentiable pointnet2 three_nn); see CLAUDE.md parity
# invariants. The reference trains under DDP(find_unused_parameters=True):
# these params keep grad=None and torch.optim SKIPS them entirely — no
# moment update AND no decoupled weight decay. Masking them out of decay
# makes our update exactly zero too (zero grads already give a zero Adam
# term); without this they would decay toward 0 over 600 epochs while the
# reference leaves them at init (proven by parity/run_parity_grad.py).
ZERO_GRAD_PARAM_MARKERS = ("query_ranking", "linear_offset", "proj_v_off")


def _clip_by_global_norm_torch(max_norm: float, eps: float = 1e-6):
    """torch.nn.utils.clip_grad_norm_ semantics (reference runner.py:207):
    ``coef = min(max_norm / (global_norm + 1e-6), 1.0)``.

    optax.clip_by_global_norm omits the +1e-6 denominator epsilon — a
    ~1.5e-8 relative scale difference on every clipped update, flagged by
    the fp64 train-step parity harness (parity/run_parity_grad.py)."""
    import jax.numpy as jnp

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        coef = jnp.minimum(max_norm / (g_norm + eps), 1.0)
        return jax.tree.map(lambda u: u * coef, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_opt_sched(config, steps_per_epoch: int, params, frozen_paths=()):
    """Build the optax transform + (epoch→lr, epoch→bn momentum) schedules.

    The LR schedule steps per optimizer update with epoch = step/steps_per_epoch
    (the reference steps LambdaLR per epoch and GradualWarmup per iter,
    tools/runner.py:240-248 — per-iter continuous stepping subsumes both).
    """
    opt_cfg = config.optimizer
    sched_cfg = config.scheduler
    max_epoch = int(config.get("max_epoch", 300))
    kwargs = opt_cfg.kwargs
    base_lr = float(kwargs.lr)
    lr_epoch = build_lr_schedule(base_lr, sched_cfg, max_epoch)

    k = int(config.get("step_per_update", 1))  # grad accumulation factor

    def _lr_at(count, per_epoch):
        # int32/int true-divides to f32 even under x64 — cast the count to
        # the default float dtype first (f64 in the fp64 parity harness)
        import jax.numpy as jnp

        return lr_epoch(jnp.asarray(count, jnp.result_type(float)) / per_epoch)

    def lr_step(step):
        """epoch-correct lr from a RAW BATCH count (runner logging)."""
        return _lr_at(step, steps_per_epoch)

    def lr_update(step):
        """epoch-correct lr from an OPTIMIZER-UPDATE count: under
        optax.MultiSteps the inner chain (and its schedule counter) steps
        once per k mini-batches, so the per-epoch divisor shrinks by k —
        otherwise the warmup/decay would stretch to k× the configured
        epochs. Identical to lr_step at k=1."""
        return _lr_at(step, steps_per_epoch / k)

    def _frozen(path):
        s = jax.tree_util.keystr(path)
        return any(f in s for f in frozen_paths)

    def _zero_grad(path):
        s = jax.tree_util.keystr(path)
        return any(m in s for m in ZERO_GRAD_PARAM_MARKERS)

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, p: p.ndim > 1 and not _frozen(path) and not _zero_grad(path),
        params,
    )
    wd = float(kwargs.get("weight_decay", 0.0))
    # torch skips params whose grad is None: frozen subtrees AND the DDP
    # find_unused zero-grad subtrees get neither moments nor L2 there —
    # mask coupled decay off both (reference builder.py:56-58 filters
    # requires_grad; the zero-grad markers stay None under DDP)
    trainable_mask = jax.tree_util.tree_map_with_path(
        lambda path, _: not _frozen(path) and not _zero_grad(path), params
    )
    if opt_cfg.type == "AdamW":
        tx = optax.adamw(lr_update, weight_decay=wd, mask=decay_mask)
    elif opt_cfg.type == "Adam":
        # torch.optim.Adam: COUPLED L2 (wd·p added to the grad before the
        # moment updates) on every trainable param incl. 1-D — NOT the
        # AdamW decoupled+masked decay (reference builder.py:55-56)
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=trainable_mask)
            if wd
            else optax.identity(),
            optax.adam(lr_update),
        )
    elif opt_cfg.type == "SGD":
        # torch.optim.SGD defaults: momentum=0, nesterov=False, coupled L2
        # via the `weight_decay` kwarg (reference builder.py:57-58 passes
        # config kwargs straight through)
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=trainable_mask)
            if wd
            else optax.identity(),
            optax.sgd(
                lr_update,
                momentum=float(kwargs.get("momentum", 0.0)) or None,
                nesterov=bool(kwargs.get("nesterov", False)),
            ),
        )
    else:
        raise NotImplementedError(f"optimizer {opt_cfg.type}")

    grad_clip = float(config.get("grad_norm_clip", 10.0))  # runner.py:207-212
    tx = optax.chain(_clip_by_global_norm_torch(grad_clip), tx)
    if frozen_paths:
        # Zero frozen-subtree grads BEFORE the clip: the reference freezes
        # via requires_grad=False (runner.py:55-66), so those grads are None
        # and torch's clip_grad_norm_ never sees them — our jax.grad DOES
        # compute them (gradient flows through the frozen net), and leaving
        # them in would inflate the global norm and rescale every clipped
        # update. Zeroed grads give a zero Adam term and decay is already
        # masked off frozen paths, so the final update is exactly zero —
        # the jax analog of requires_grad=False.
        frozen_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: _frozen(path), params
        )
        tx = optax.chain(optax.masked(optax.set_to_zero(), frozen_mask), tx)
    # gradient accumulation (reference step_per_update, runner.py:207-215).
    # The reference SUMS the k backward passes (loss.backward() k times,
    # never rescaled), then clips/steps on the sum — optax.MultiSteps hands
    # the inner chain the running MEAN instead, which would halve (at k=2)
    # the clip engagement, the SGD step, and the grad-to-wd·p ratio of the
    # coupled-L2 optimizers. Scale by k first so the chain sees the
    # reference's summed gradient (k·mean == the sum, up to running-mean
    # rounding).
    if k > 1:
        tx = optax.MultiSteps(
            optax.chain(optax.scale(float(k)), tx), every_k_schedule=k
        )

    bnm_epoch = build_bnm_schedule(config.get("bnmscheduler", None))
    return tx, lr_step, bnm_epoch
