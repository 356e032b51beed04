"""Protocol-level tests: EMD vs optimal assignment, ShapeNet-55 test branch,
device prefetch, KITTI visualisation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_emd_auction_near_optimal():
    """Auction EMD cost must approach scipy's optimal assignment for small n."""
    from scipy.optimize import linear_sum_assignment

    from imgadapointr_tpu.ops import emd_auction

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 3).astype(np.float32)
    y = rng.rand(1, 64, 3).astype(np.float32)
    dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(y), eps=0.001, iterations=2000)
    ours = float(jnp.sum(dist))

    C = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
    ri, ci = linear_sum_assignment(C)
    optimal = float(C[ri, ci].sum())
    # auction with small eps: within (1 + small) of optimal
    assert ours <= optimal * 1.15 + 1e-6, (ours, optimal)
    assert ours >= optimal - 1e-6


@pytest.mark.parametrize("n", [1024, 2048])
def test_emd_auction_protocol_knobs(n):
    """EMD at the TEST protocol's knobs (eps .005, 100 iters — reference
    utils/metrics.py:112-116) vs scipy Hungarian at realistic sizes. The
    CUDA reference is itself an approximation at these knobs (its docstring:
    'the result is an approximation'); the metric is mean(sqrt(dist)), so
    the tolerance is on that quantity. Also exercises the tiled item scan
    (n > _TILE for n=2048) and unit-cube normalisation, the regime the CUDA
    kernel documents ('normalized to [0, 1]')."""
    from scipy.optimize import linear_sum_assignment

    from imgadapointr_tpu.ops import emd_auction

    rng = np.random.RandomState(1)
    x = rng.rand(1, n, 3).astype(np.float32)
    y = rng.rand(1, n, 3).astype(np.float32)
    dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(y), eps=0.005, iterations=100)
    ours_sq = float(jnp.sum(dist))

    C = ((x[0][:, None].astype(np.float64) - y[0][None]) ** 2).sum(-1)
    ri, ci = linear_sum_assignment(C)
    optimal_sq = float(C[ri, ci].sum())
    # dist must be consistent with the returned assignment (the reference's
    # own self-verification, emd_module.py:88-95)
    matched = y[0][np.asarray(assign)[0]]
    recomputed = np.sqrt(((x[0] - matched) ** 2).sum(-1)).mean()
    np.testing.assert_allclose(float(np.mean(np.sqrt(np.asarray(dist)[0]))),
                               recomputed, rtol=1e-5)
    # At protocol knobs the assignment is NOT guaranteed bijective (the CUDA
    # reference documents the same, emd_module.py:19) — ~1% of bidders take
    # already-owned items via the greedy fallback, so the Hungarian optimum
    # is not a strict lower bound. Assert a tight band around it plus
    # near-bijectivity.
    uniq = len(np.unique(np.asarray(assign)[0]))
    assert uniq >= 0.97 * n, f"assignment far from bijective: {uniq}/{n}"
    assert 0.9 * optimal_sq <= ours_sq <= optimal_sq * 1.25, (ours_sq, optimal_sq)


def test_emd_auction_convergent_regime_is_bijective_and_bounded():
    """With enough iterations the auction converges: fully bijective and
    the sum-of-squared objective within eps-bound of the Hungarian optimum
    (then the optimum IS a valid lower bound)."""
    from scipy.optimize import linear_sum_assignment

    from imgadapointr_tpu.ops import emd_auction

    n = 512
    rng = np.random.RandomState(2)
    x = rng.rand(1, n, 3).astype(np.float32)
    y = rng.rand(1, n, 3).astype(np.float32)
    dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(y), eps=0.002, iterations=1500)
    assert len(np.unique(np.asarray(assign)[0])) == n  # bijection
    ours_sq = float(jnp.sum(dist))
    C = ((x[0][:, None].astype(np.float64) - y[0][None]) ** 2).sum(-1)
    ri, ci = linear_sum_assignment(C)
    optimal_sq = float(C[ri, ci].sum())
    assert optimal_sq - 1e-6 <= ours_sq <= optimal_sq + n * 0.002 * 2, (ours_sq, optimal_sq)


class _FakeLoader:
    """Single-category loader yielding gt-only batches for protocol tests."""

    def __init__(self, n=2, npoints=256):
        rng = np.random.RandomState(0)
        self.batches = [
            (
                ["02691156"],
                [f"m{i}"],
                {
                    "partial": rng.randn(1, 128, 3).astype(np.float32),
                    "gt": rng.randn(1, npoints, 3).astype(np.float32),
                },
            )
            for i in range(n)
        ]

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _tiny_runner():
    from imgadapointr_tpu.tools.runner import Runner
    from imgadapointr_tpu.utils.config import AttrDict

    config = AttrDict(
        {
            "consider_metric": "CDL1",
            "dataset": {"test": {"NAME": "ShapeNetTest", "N_POINTS": 256}},
            "model": {
                "NAME": "AdaPoinTr", "num_query": 16, "num_points": 128,
                "center_num": [32, 16], "global_feature_dim": 64,
                "encoder_type": "graph", "decoder_type": "fc",
                "encoder_config": {
                    "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                    "n_group": 2, "mlp_ratio": 2.0,
                    "block_style_list": ["attn"], "combine_style": "concat",
                },
                "decoder_config": {
                    "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                    "n_group": 2, "mlp_ratio": 2.0,
                    "self_attn_block_style_list": ["attn"],
                    "self_attn_combine_style": "concat",
                    "cross_attn_block_style_list": ["attn"],
                    "cross_attn_combine_style": "concat",
                },
            },
        }
    )

    class A:
        tp = 1
        seed = 0
        mode = "easy"
        emd = False
        experiment_path = "/tmp/test_protocols_exp"

    runner = Runner(A(), config)
    state = runner.init_state({"partial": np.zeros((1, 2048, 3), np.float32)})
    return runner, state, A(), config


@pytest.fixture(scope="module")
def tiny_runner():
    return _tiny_runner()


def test_shapenet55_protocol(tiny_runner):
    from imgadapointr_tpu.tools.runner import METRIC_NAMES, test

    runner, state, args, config = tiny_runner
    out = test(runner, state, _FakeLoader(), args, config)
    assert set(out) == set(METRIC_NAMES)
    assert np.isfinite(out["CDL1"]) and out["CDL1"] > 0


def test_kitti_protocol(tiny_runner):
    from imgadapointr_tpu.tools.runner import test

    runner, state, args, config = tiny_runner
    config.dataset.test.NAME = "KITTI"
    test(runner, state, _FakeLoader(npoints=4), args, config)
    vis = os.listdir(os.path.join(args.experiment_path, "vis_result"))
    assert any(v.endswith(".jpg") for v in vis)


def test_prefetch_preserves_order_and_content(tiny_runner):
    runner, state, args, config = tiny_runner
    loader = _FakeLoader(n=5)
    # prefetch is the TRAIN path → strict sharding: batches must divide the
    # 8-device virtual mesh (bs=1 eval batches go through eval_step instead)
    for _, _, b in loader.batches:
        for k in b:
            b[k] = np.tile(b[k], (8, 1, 1))
    out = list(runner.prefetch(iter(loader), depth=3))
    assert [m for _, m, _ in out] == [m for _, m, _ in loader.batches]
    for (_, _, got), (_, _, want) in zip(out, loader.batches):
        np.testing.assert_allclose(np.asarray(got["gt"]), want["gt"])
        assert isinstance(got["gt"], jax.Array)
