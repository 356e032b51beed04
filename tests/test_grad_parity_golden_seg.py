"""Frozen GRADIENT-parity golden (COMPACT) for the SUPERSET seg model
(ImgEncSegDecAdaPoinTrVariableLoss) vs the reference torch implementation.

tests/goldens/imgsegdec_tiny384_grad.npz was produced by
``parity/run_parity_grad.py --model imgsegdec --init ours --compact
--epoch 30 --n-points 1024 --batch 1``: parameters come from OUR
deterministic flax init (parity/param_source.py) loaded into the reference
model (models/internal/ImgEncSegDecAdaPoinTrVariableLoss.py, CPU torch,
frozen GDANet pinned to eval) through the traced converter inverse; the
reference ran one full variable-loss training step + backward plus fp64
one-step optimizer updates on shared procedural gradients.  Only per-block
DIGESTS are frozen (round-4 compaction: 235 MB → ~2 MB); fp64 validation
of the same flax-init weights passes all 373 blocks at worst 1.7e-9
(parity/PARITY.md).

Seg-specific semantics locked down (beyond test_grad_parity_golden):
- gradient flows THROUGH the frozen GDANet into the coarse cloud (the
  reference never sets requires_grad=False before backward — grads exist
  on segmentator params but are never applied); compared with the relaxed
  f32 band (param_source.RELAXED_GRADS — cancellation-dominated at f32),
- the normals path d(loss)/d(coarse) stays live (reference does not
  detach pytorch3d normals); signs are solver-arbitrary, so CI re-runs
  live normals sign-aligned to the captured reference normals,
- frozen-subtree optimizer updates are EXACTLY zero and frozen grads are
  excluded from the global-norm clip (builder.py frozen mask BEFORE clip),
- the variable-loss alpha table (shifted CycleLR) in the backward
  (golden written at epoch 30).
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
    os.path.dirname(__file__), "goldens", "imgsegdec_tiny384_grad.npz"
)
CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "cfgs", "SegImgPCN_models",
    "ImgEncSegDec-tiny384.yaml",
)


@pytest.fixture(scope="module")
def env():
    return build_env(CONFIG, "imgsegdec", GOLDEN)


def test_loss_values_match_reference(env):
    check_losses(env)


def test_gradients_match_reference(env):
    check_grads(env)


def test_bn_stats_update_matches_reference(env):
    check_bn_stats(env)


def test_adamw_update_matches_reference(env):
    """Frozen segmentator excluded from optimizer AND clip; exactly-zero
    updates on frozen + find_unused subtrees; decay masking."""
    check_optimizer(env, "model")


def test_sgd_update_matches_reference(env):
    check_optimizer(env, "sgd")
