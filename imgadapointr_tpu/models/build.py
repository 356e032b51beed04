"""ModelSpec: module + loss + input signature, built from config.

The reference couples these as methods on nn.Module subclasses
(``forward``/``get_loss``, e.g. models/external/AdaPoinTr.py:193-265) and
unpacks dataloader tuples per dataset name inside the runner
(tools/runner.py:142-184). Here the registry yields a declarative spec the
runner consumes uniformly: which batch keys the model eats, and a pure loss
function (ret, gt, epoch) → (sparse_loss, dense_loss).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from ..utils.registry import MODELS


@dataclass
class ModelSpec:
    module: object  # flax module
    loss_fn: Callable  # (ret, gt, epoch) -> (sparse_loss, dense_loss)
    inputs: Sequence[str] = ("partial",)  # batch keys fed to __call__ in order
    name: str = ""
    has_batch_stats: bool = True
    needs_noise_rng: bool = True
    # param-path substrings whose subtrees are frozen (no grads, no decay) —
    # the reference's requires_grad=False GDANet (tools/runner.py:55-66)
    frozen_paths: Sequence[str] = field(default_factory=tuple)


def build_model_spec(config) -> ModelSpec:
    spec = MODELS.build(config)
    assert isinstance(spec, ModelSpec), f"{config.NAME} did not build a ModelSpec"
    spec.name = config.NAME
    return spec
