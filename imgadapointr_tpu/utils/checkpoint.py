"""Checkpoint save/resume with the reference's best/last/final policy.

Reference tools/builder.py:90-167 + tools/runner.py:283-302: rank-0 writes
``ckpt-best`` / ``ckpt-last`` / ``ckpt-epoch-NNN`` (final two epochs) holding
model + optimizer + epoch + metrics. Here the payload is a flax-serialized
pytree (params, batch_stats, opt_state) + a JSON sidecar of metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
from flax import serialization

from .logger import print_log


def fetch_to_host(tree):
    """Device→host for a whole pytree with overlapped transfers.

    ``jax.device_get`` pulls leaves serially — one round-trip each, which is
    minutes for a full train state over a remote-TPU link. Kick off every
    copy async first, then materialise.
    """
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(
    state: dict,
    metrics: Optional[dict],
    best_metrics: Optional[dict],
    epoch: int,
    prefix: str,
    experiment_path: str,
    logger=None,
):
    """Atomic save: both files are written to temp names in the same
    directory, fsynced, then ``os.replace``d into place (payload first,
    meta second — a reader that sees the new meta also sees the new
    payload). A SIGKILL at ANY instant leaves the previous complete
    checkpoint intact; resume never observes a truncated file. The
    reference's save (tools/builder.py:130-139) is equally vulnerable to
    mid-write kills — this beats it rather than matching it (preemption +
    ``--resume`` is the designated recovery path here)."""
    if jax.process_index() != 0:
        return
    os.makedirs(experiment_path, exist_ok=True)
    path = os.path.join(experiment_path, prefix + ".ckpt")
    host_state = fetch_to_host(state)
    meta = {
        "epoch": epoch,
        "metrics": metrics,
        "best_metrics": best_metrics,
    }
    _atomic_write(path, serialization.to_bytes(host_state))
    _atomic_write(path + ".json", json.dumps(meta).encode())
    print_log(f"Save checkpoint at {path}", logger=logger)


def _atomic_write(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(template_state: dict, prefix: str, experiment_path: str):
    """Restore into the structure of ``template_state``; returns
    (state, meta dict)."""
    path = os.path.join(experiment_path, prefix + ".ckpt")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path, "rb") as f:
        state = serialization.from_bytes(template_state, f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def checkpoint_exists(prefix: str, experiment_path: str) -> bool:
    return os.path.exists(os.path.join(experiment_path, prefix + ".ckpt"))


def load_weights_only(template_state: dict, path: str) -> dict:
    """Weights-only restore from an ARBITRARY native ``.ckpt`` file.

    Reference ``--start_ckpts`` semantics (tools/runner.py:51-52 →
    tools/builder.py:141-157 ``load_model``): warm-start params + batch
    stats from any checkpoint path while the optimizer/schedule start
    fresh. The file's ``opt_state``/``step`` entries (if present) are
    deliberately ignored — the donor may have been trained with a different
    optimizer or horizon — so only the weight trees must match the model.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if not isinstance(raw, dict) or "params" not in raw:
        raise ValueError(f"{path}: no 'params' tree in checkpoint")
    out = dict(template_state)
    out["params"] = serialization.from_state_dict(
        template_state["params"], raw["params"]
    )
    if template_state.get("batch_stats"):
        out["batch_stats"] = serialization.from_state_dict(
            template_state["batch_stats"], raw.get("batch_stats", {})
        )
    return out
