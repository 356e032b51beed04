"""Device mesh construction and sharding rules (dp × tp over ICI).

Replaces the reference's process-per-GPU NCCL topology
(utils/dist_utils.py:9-24, scripts/dist_train.sh): one jit-compiled train
step over a ``Mesh(('data', 'model'))``; gradient averaging, metric means
and tensor-parallel collectives all compile to XLA all-reduces over ICI
(DCN across slices via ``jax.distributed.initialize`` on multi-host).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
POINTS_AXIS = "points"  # ops/sharded.py ring ops ride this axis (--sp)


def make_mesh(devices=None, tp: int = 1, sp: int = 1) -> Mesh:
    """(n_devices/(tp·sp)) × tp [× sp] mesh.

    Axes ('data', 'model'), plus a third 'points' axis when ``sp > 1`` —
    the point-dimension axis the big-N ring ops (ops/sharded.py) shard
    over when wired into the runner via ``--sp``. The axis is only added
    when requested so the default mesh keeps its two-axis shape."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % (tp * sp) == 0, f"{n} devices not divisible by tp={tp}·sp={sp}"
    if sp > 1:
        arr = np.asarray(devices).reshape(n // (tp * sp), tp, sp)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, POINTS_AXIS))
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over 'data', replicated over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(params, mesh: Mesh, min_size: int = 1 << 16):
    """Tensor-parallel shardings: large 2-D kernels split on the output dim
    over 'model'; everything else replicated. XLA/GSPMD inserts the
    all-gathers/reduce-scatters this layout implies.

    With tp=1 this degenerates to pure data parallelism (the reference's
    only strategy, SURVEY.md §2.7); the 'model' axis exists so the same jit
    graph scales models that outgrow one chip.
    """
    tp = mesh.shape[MODEL_AXIS]

    def rule(path, p):
        if (
            tp > 1
            and p.ndim == 2
            and p.size >= min_size
            and p.shape[-1] % tp == 0
        ):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch, mesh: Mesh, strict: bool = False):
    """Place a host batch onto the mesh, batch dim over 'data'.

    Arrays whose leading dim doesn't divide the data axis (e.g. the bs=1
    eval/test protocol, reference tools/runner.py:483) are replicated —
    unless ``strict=True`` (the TRAIN path), where silent replication would
    mean running every chip on the full batch at 1/n throughput: a
    misconfigured train batch fails loudly instead."""
    s = batch_sharding(mesh)
    rep = replicated(mesh)
    n_data = mesh.shape[DATA_AXIS]

    def put(x):
        fits = hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n_data == 0
        if strict and not fits and hasattr(x, "shape") and x.ndim > 0:
            raise ValueError(
                f"train batch dim {x.shape[0]} does not divide the data axis "
                f"({n_data} devices) — adjust total_bs so every chip gets an "
                f"equal shard (silent replication is disabled on the train "
                f"path)"
            )
        return jax.device_put(x, s if fits else rep)

    return jax.tree.map(put, batch)
