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
    if jax.process_index() != 0:
        return
    os.makedirs(experiment_path, exist_ok=True)
    path = os.path.join(experiment_path, prefix + ".ckpt")
    host_state = fetch_to_host(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    meta = {
        "epoch": epoch,
        "metrics": metrics,
        "best_metrics": best_metrics,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    print_log(f"Save checkpoint at {path}", logger=logger)


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
