"""Evaluation metrics (reference utils/metrics.py:15-165).

All metrics are jit-compatible batched functions; the reference computed
F-Score per-sample on CPU via open3d (utils/metrics.py:68-90) — here it is
the same what3d formula on-device (euclidean NN distances via the tiled
nn_distance kernel), batched.

Display scaling matches the reference: CD/EMD ×1000.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import chamfer_l1, chamfer_l2, nn_distance

METRIC_NAMES = ["F-Score", "CDL1", "CDL2", "EMDistance"]
# is-greater-better flags + init values (reference utils/metrics.py:16-43)
METRIC_SIGNS = {"F-Score": True, "CDL1": False, "CDL2": False, "EMDistance": False}
METRIC_INIT = {"F-Score": 0.0, "CDL1": 32767.0, "CDL2": 32767.0, "EMDistance": 32767.0}


def f_score(pred: jax.Array, gt: jax.Array, th: float = 0.01) -> jax.Array:
    """what3d F-Score@th, batched; returns the batch mean.

    precision = mean(d(pred→gt) < th), recall = mean(d(gt→pred) < th),
    F = 2PR/(P+R) (reference utils/metrics.py:68-90).
    """
    d1, d2, _, _ = nn_distance(pred, gt)
    dist1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    dist2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    precision = jnp.mean((dist1 < th).astype(jnp.float32), axis=1)
    recall = jnp.mean((dist2 < th).astype(jnp.float32), axis=1)
    denom = precision + recall
    f = jnp.where(denom > 0, 2.0 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
    return jnp.mean(f)


def compute_metrics(pred, gt, require_emd: bool = False):
    """Return [F-Score, CDL1×1000, CDL2×1000, EMD×1000] (reference
    Metrics.get, utils/metrics.py:46-57). EMD is 0 unless requested."""
    vals = [
        f_score(pred, gt),
        chamfer_l1(pred, gt) * 1000.0,
        chamfer_l2(pred, gt) * 1000.0,
    ]
    if require_emd:
        from ..ops.emd import emd_distance_metric

        vals.append(emd_distance_metric(pred, gt) * 1000.0)
    else:
        vals.append(jnp.asarray(0.0))
    return vals


class Metrics:
    """Value object with better_than comparison on the considered metric
    (reference utils/metrics.py:118-165)."""

    def __init__(self, metric_name: str, values):
        if metric_name not in METRIC_NAMES:
            raise ValueError(f"unknown metric {metric_name}")
        self.metric_name = metric_name
        if isinstance(values, dict):
            self._values = dict(values)
        else:
            self._values = {n: float(v) for n, v in zip(METRIC_NAMES, values)}

    def state_dict(self):
        return dict(self._values)

    def value(self):
        return self._values[self.metric_name]

    def better_than(self, other: "Metrics | None") -> bool:
        if other is None:
            return True
        greater = METRIC_SIGNS[self.metric_name]
        return (
            self.value() > other.value() if greater else self.value() < other.value()
        )

    def __repr__(self):
        return f"Metrics({self.metric_name}, {self._values})"
