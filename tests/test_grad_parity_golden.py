"""Frozen GRADIENT-parity golden (COMPACT) vs the reference torch AdaPoinTr.

tests/goldens/adapointr_tiny_grad.npz was produced by
``parity/run_parity_grad.py --init ours --compact``: parameters come from
OUR deterministic flax init (parity/param_source.py), loaded into the
reference torch model (CPU, fixed seed) through the traced converter
inverse (parity/torch_load.py); the reference ran one full training loss
(denoise CD-L1 ×0.5 + CD-L1 coarse+fine, models/external/AdaPoinTr.py:
193-216) and backward, plus fp64 one-step updates of the config optimizer
AND an SGD-momentum variant on shared procedural gradients.  Only per-block
DIGESTS of the reference results are frozen (maxabs/l2/strided sample —
round-4 golden compaction, 61 MB → <1 MB); this test regenerates OUR side
and asserts backward + optimizer parity without torch or the reference.

Semantics locked down (validated fp64 offline, asserted at f32/f64 here):
- per-block gradients of the full training loss (tol 5e-3, f32 headroom),
- the zero-gradient invariant for query_ranking / deformable offset nets
  (reference trains under DDP find_unused_parameters=True),
- BN running-stat updates under the BN-momentum scheduler,
- fp64 optimizer digests: AdamW add_weight_decay masking (no decay on 1-d
  params / find_unused subtrees, builder.py:37-62), torch clip semantics
  ``max_norm/(norm+1e-6)`` (runner.py:207-212 — the SGD variant is linear
  in the grads, so the epsilon leaves a ~1e-7 fingerprint), and exactly-
  zero updates on None-grad subtrees.
"""

import os

import pytest

from tests.golden_compact import (
    build_env,
    check_bn_stats,
    check_grads,
    check_losses,
    check_optimizer,
)

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "adapointr_tiny_grad.npz"
)
CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "cfgs", "PCN_models", "AdaPoinTr-tiny.yaml"
)


@pytest.fixture(scope="module")
def env():
    return build_env(CONFIG, "adapointr", GOLDEN)


def test_loss_values_match_reference(env):
    check_losses(env)


def test_gradients_match_reference(env):
    check_grads(env)


def test_bn_stats_update_matches_reference(env):
    check_bn_stats(env)


def test_adamw_update_matches_reference(env):
    check_optimizer(env, "model")


def test_sgd_update_matches_reference(env):
    """The linear path that can actually SEE the clip coefficient — catches
    the round-3 torch-clip-epsilon drift class at fp64 resolution."""
    check_optimizer(env, "sgd")
